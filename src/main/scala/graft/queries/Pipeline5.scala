package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import graft.dedup.{Bloom, NGramArray}
import graft.ops.{Mix, Shard}
import graft.sim.Similarity
import graft.text.TextOps

/** Training-data curation batch five: token-budget domain mixing,
  * deterministic output sharding with auditable manifests, gram-novelty
  * scoring, Bloom-prescan decontamination, centroid-distance outlier
  * detection, the leakage-safe train/eval split, the composed curation
  * decision table, int8 embedding quantization, and quantized retrieval
  * with exact re-rank.
  */
object Pipeline5 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------- q64
  // Token-budget domain mixing: half the corpus' tokens, allocated across
  // sources by integral mixture weights (every third source is weighted
  // double), each source contributing docs in hash order until its slice
  // fills. BIGINT-exact budget arithmetic, one window shuffle — see
  // graft.ops.Mix.
  private val MixNum = 1L
  private val MixDen = 2L

  private def srcWeight(source: org.apache.spark.sql.Column) =
    when(substring(source, 4, 10).cast("long") % 3 === 0, 2L).otherwise(1L)

  private val q64: Q = (s, d) => {
    val rows = FeatureMemo.features(s, d).select(col("doc_id"),
      col("source"), col("n_tokens_ws").as("_t"))
    Mix.tokenBudgetMix(rows, "doc_id", "source", col("_t"),
        srcWeight(col("source")), MixNum, MixDen)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("rnk"),
        col("budget"))
      .orderBy(col("source"), col("rnk"))
  }

  private lazy val q64Sql = {
    val from = s"""SELECT doc_id, source,
        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(string_split_regex(trim(text), '\\s+'))
             END AS BIGINT) AS toks,
        CASE WHEN CAST(substr(source, 4) AS BIGINT) % 3 = 0
             THEN 2 ELSE 1 END AS w
      FROM documents"""
    s"""
    WITH ${Mix.tokenBudgetMixSql(from, "doc_id", "source", MixNum, MixDen)}
    SELECT source, doc_id, toks AS n_tokens, rnk, budget
    FROM kept ORDER BY source, rnk"""
  }

  // ------------------------------------------------------------------- q65
  // Deterministic sharding manifest: 16 hash shards, each with a content
  // digest over its members in deterministic order — the auditable
  // training-data writer (see graft.ops.Shard).
  private val NShards = 16

  private val q65: Q = (s, d) =>
    // rides the stored feature table: the manifest writer consumes the
    // ingestion-time token counts and fingerprints, not a fresh scan
    Shard.manifest(FeatureMemo.features(s, d), "doc_id",
        col("n_tokens_ws"), col("fp"), NShards)
      .orderBy(col("shard_id"))

  private lazy val q65Sql = {
    val from = s"""SELECT doc_id,
        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(string_split_regex(trim(text), '\\s+'))
             END AS BIGINT) AS toks,
        md5(${OracleSql.normSql}) AS fp
      FROM documents"""
    s"""
    WITH ${Shard.manifestSql(from, "doc_id", NShards)}
    SELECT shard_id, n_docs, total_tokens, shard_fp
    FROM manifest_ ORDER BY shard_id"""
  }

  // ------------------------------------------------------------------- q66
  // Gram novelty (inter-document originality): the fraction of a doc's
  // distinct 3-grams appearing in NO other document. Integer counts all
  // the way (deterministic), two shuffles: gram doc-frequency (map-side
  // combinable) and the join back on gram — the q60 shape. The dual of
  // the repetition ratio (q57 scores repetition WITHIN a doc; this
  // scores uniqueness ACROSS docs).
  private val q66: Q = (s, d) => {
    val pairs = documents(s, d).select(col("doc_id"),
      explode(column(NGramArray(expression(col("text")), 3))).as("gram"))
    val dfreq = pairs.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    pairs.join(dfreq, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_grams"), 6))
      .orderBy(col("doc_id"))
  }

  private lazy val q66Sql = s"""
    WITH nd AS (
      SELECT doc_id, string_split(${OracleSql.normSql}, ' ') AS w
      FROM documents),
    g AS (SELECT doc_id, unnest(${OracleSql.grams3Sql}) AS gram FROM nd),
    dfreq AS (SELECT gram, count(*) AS df FROM g GROUP BY 1)
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           round(CAST(sum(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS novelty
    FROM g JOIN dfreq USING (gram)
    GROUP BY g.doc_id ORDER BY g.doc_id"""

  // ------------------------------------------------------------------- q67
  // Bloom-prescan decontamination: q56's eval 8-gram set compressed to a
  // 200003-bit deterministic Bloom filter (md5-slice positions — see
  // graft.dedup.Bloom), every corpus gram testing its 3 bits against a
  // ~25 KiB bitset LITERAL inside its own scan (Bloom.probeBitset —
  // zero joins; the r5 form spent three broadcast probe joins, i.e. two
  // needless extra passes over the corpus stream), with the exact gram
  // join run alongside to account the false positives the prescan would
  // hand to a second-pass verify. At 100 TB the bitset is ~25 KiB where
  // the gram set is gigabytes.
  private val DecontamN = 8

  private val q67: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"),
      column(NGramArray(expression(col("text")), DecontamN)).as("_g"))
    // pinned (r11, the q159 rule): the eval gram set feeds BOTH the
    // plan-time bitset collect and the exact-hit broadcast — unpinned,
    // the eval slice's gram explode + distinct ran twice per execution
    val evalG = docs.filter(col("doc_id") % 10 === 0)
      .select(explode(col("_g")).as("gram")).distinct()
      .localCheckpoint()
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), explode(col("_g")).as("gram"))
    val probed = Bloom.probeBitset(corpus, "gram", evalG)
    val exact = broadcast(evalG.withColumn("_hit", lit(1)))
    probed.join(exact, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_bloom"), 1L).otherwise(0L)).as("n_bloom_hits"),
        count(col("_hit")).as("n_exact_hits"))
      .withColumn("n_false_pos", col("n_bloom_hits") - col("n_exact_hits"))
      .withColumn("is_clean", col("n_bloom_hits") === 0)
      .orderBy(col("doc_id"))
  }

  private lazy val q67Sql = s"""
    WITH ${OracleSql.bloomPrescanCtes(DecontamN, 10)},
    j AS (
      SELECT pr.doc_id,
             ${OracleSql.bloomHitSql} AS bloom,
             ev.gram IS NOT NULL AS hit
      FROM pr
        ${OracleSql.bloomJoinsSql}
        LEFT JOIN ev ON pr.gram = ev.gram)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN bloom THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_hits,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_hits,
           CAST(sum(CASE WHEN bloom THEN 1 ELSE 0 END)
              - sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_pos,
           sum(CASE WHEN bloom THEN 1 ELSE 0 END) = 0 AS is_clean
    FROM j GROUP BY doc_id ORDER BY doc_id"""

  // ------------------------------------------------------------------- q68
  // Centroid-distance outliers: per-label embedding centroid (bounded
  // groups×dim aggregate, components rounded — see
  // Similarity.groupCentroids), every vector's cosine to its OWN label's
  // centroid via one broadcast join + the native DotCosine pass, flagged
  // below 0. The embedding-space quality filter: vectors that don't
  // resemble their own cluster are mislabeled or junk.
  private val OutlierThreshold = 0.0

  private val q68: Q = (s, d) => {
    val emb = embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    val cent = Similarity.groupCentroids(emb, "label")
    emb.join(broadcast(cent), Seq("label"))
      .withColumn("sim",
        round(Similarity.cosine(col("embedding"), col("centroid")), 6))
      .select(col("vec_id"), col("label"), col("sim"),
        (col("sim") < OutlierThreshold).as("is_outlier"))
      .orderBy(col("vec_id"))
  }

  private lazy val q68Sql = s"""
    WITH ${OracleSql.centroidCtes},
    sims AS (
      SELECT e.vec_id, e.label,
             ${OracleSql.cos64Sql("e.embedding", "c.centroid")} AS sim
      FROM e JOIN c USING (label))
    SELECT vec_id, label, sim, sim < $OutlierThreshold AS is_outlier
    FROM sims ORDER BY vec_id"""

  // ------------------------------------------------------------------- q69
  // Leakage-safe train/eval split: a random DOC-level split leaks
  // near-duplicates of training docs into eval; splitting by near-dup
  // CLUSTER (q54's embedding clustering) assigns each whole duplicate
  // family to one side. The side is the md5 bucket of the cluster id —
  // deterministic, ~1/16 eval.
  private val q69: Q = (s, d) => {
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val edges = EmbMemo.pairs(s, d)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    graft.dedup.DedupOps
      .connectedComponents(emb.select(col("vec_id").as("id")), edges)
      .select(col("id").as("vec_id"), col("cluster_id"),
        when(substring(md5(to_binary(col("cluster_id").cast("string"),
          lit("utf-8"))), 1, 1) === "0", "eval").otherwise("train")
          .as("split"))
      .orderBy(col("vec_id"))
  }

  private lazy val q69Sql = s"""
    WITH RECURSIVE ${OracleSql.embeddingPairsCtes},
    edges AS (SELECT id_a, id_b FROM pairs WHERE sim >= 0.2),
    sym AS (
      SELECT id_a AS a, id_b AS b FROM edges
      UNION ALL
      SELECT id_b AS a, id_a AS b FROM edges),
    lbl AS (
        SELECT vec_id AS id, vec_id AS l FROM embeddings
      UNION
        SELECT s.a AS id, lbl.l AS l
        FROM lbl JOIN sym s ON s.b = lbl.id
        WHERE lbl.l < s.a),
    cc AS (SELECT id AS vec_id, min(l) AS cluster_id FROM lbl GROUP BY id)
    SELECT vec_id, cluster_id,
           CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1) = '0'
                THEN 'eval' ELSE 'train' END AS split
    FROM cc ORDER BY vec_id"""

  // ------------------------------------------------------------------- q70
  // The curation DECISION table — the capstone that a real pipeline ships
  // to its writer: every document with its cheap signals (language,
  // quality, token count), its Bloom contamination prescan flag, its
  // embedding-outlier flag, and the first-failing-rule drop reason.
  // Composition stays 100 TB-shaped: one documents scan feeds both the
  // feature projection and the gram probe (scan-local bitset test, one
  // groupBy(doc) shuffle), the embedding side joins its broadcast
  // centroid table, and the three doc-level frames merge on doc_id.
  private val QualityMin = 0.91
  private val TokMin = 25L
  private val TokMax = 90L

  private val q70: Q = (s, d) => {
    // one scan computes every doc-level feature (quality, token count,
    // decontamination grams); materialized because the eval-gram build,
    // the contamination probe, and the final merge each re-ran the scan
    // and the feature expressions otherwise (ScanAudit) — in production
    // these are the stored per-doc curation features
    val docs = documents(s, d).select(col("doc_id"), col("lang"),
      TextOps.qualityScore(col("text")).as("quality"),
      TextOps.tokenCountWs(col("text")).as("n_tokens"),
      column(NGramArray(expression(col("text")), DecontamN)).as("_g"))
      .localCheckpoint()
    val evalG = docs.filter(col("doc_id") % 10 === 0)
      .select(explode(col("_g")).as("gram")).distinct()
    val contam = Bloom.probeBitset(
        docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), explode(col("_g")).as("gram")),
        "gram", evalG)
      .groupBy(col("doc_id"))
      .agg(sum(when(col("_bloom"), 1L).otherwise(0L)).as("_nb"))
    val emb = embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    val outliers = emb
      .join(broadcast(Similarity.groupCentroids(emb, "label")), Seq("label"))
      .select(col("vec_id").as("doc_id"),
        (round(Similarity.cosine(col("embedding"), col("centroid")), 6)
          < OutlierThreshold).as("is_outlier"))
    docs.drop("_g")
      .join(contam, Seq("doc_id"), "left")
      .join(outliers, Seq("doc_id"), "left")
      .withColumn("is_holdout", col("doc_id") % 10 === 0)
      .withColumn("is_contaminated",
        coalesce(col("_nb") > 0, lit(false)))
      .withColumn("drop_reason",
        when(col("is_holdout"), "holdout")
          .when(col("is_contaminated"), "contaminated")
          .when(coalesce(col("is_outlier"), lit(false)), "embedding_outlier")
          .when(col("quality") < QualityMin, "low_quality")
          .when(col("n_tokens") < TokMin || col("n_tokens") > TokMax,
            "bad_length")
          .otherwise("keep"))
      .withColumn("keep", col("drop_reason") === "keep")
      .select(col("doc_id"), col("lang"), col("quality"), col("n_tokens"),
        col("is_holdout"), col("is_contaminated"),
        coalesce(col("is_outlier"), lit(false)).as("is_outlier"),
        col("drop_reason"), col("keep"))
      .orderBy(col("doc_id"))
  }

  private lazy val q70Sql = s"""
    WITH sc AS (
      SELECT doc_id, lang, ${OracleSql.qualityScColsSql}
      FROM documents),
    q AS (SELECT doc_id, lang, ${OracleSql.qualitySql} AS quality,
            CAST(nws AS BIGINT) AS n_tokens
          FROM sc),
    ${OracleSql.bloomPrescanCtes(DecontamN, 10)},
    contam AS (
      SELECT pr.doc_id,
             sum(CASE WHEN ${OracleSql.bloomHitSql} THEN 1 ELSE 0 END) AS nb
      FROM pr
        ${OracleSql.bloomJoinsSql}
      GROUP BY pr.doc_id),
    ${OracleSql.centroidCtes},
    outl AS (
      SELECT e.vec_id AS doc_id,
             ${OracleSql.cos64Sql("e.embedding", "c.centroid")}
               < $OutlierThreshold AS is_outlier
      FROM e JOIN c USING (label)),
    dec AS (
      SELECT q.doc_id, q.lang, q.quality, q.n_tokens,
             q.doc_id % 10 = 0 AS is_holdout,
             coalesce(contam.nb > 0, false) AS is_contaminated,
             coalesce(outl.is_outlier, false) AS is_outlier
      FROM q
        LEFT JOIN contam ON q.doc_id = contam.doc_id
        LEFT JOIN outl ON q.doc_id = outl.doc_id),
    reasoned AS (
      SELECT *,
             CASE WHEN is_holdout THEN 'holdout'
                  WHEN is_contaminated THEN 'contaminated'
                  WHEN is_outlier THEN 'embedding_outlier'
                  WHEN quality < $QualityMin THEN 'low_quality'
                  WHEN n_tokens < $TokMin OR n_tokens > $TokMax
                    THEN 'bad_length'
                  ELSE 'keep' END AS drop_reason
      FROM dec)
    SELECT *, drop_reason = 'keep' AS keep
    FROM reasoned ORDER BY doc_id"""

  // ------------------------------------------------------------------- q71
  // Int8 embedding quantization (the 4:1 storage pass of a 100 TB
  // embedding store) with per-vector reconstruction-quality metrics. One
  // native scan-local pass per vector (see sim.QuantizeInt8); the codes
  // travel as an md5 fingerprint so the manifest stays narrow. Every
  // arithmetic step (floor(y+0.5) code rounding, affine reconstruct,
  // left-to-right squared-error fold) is chosen to be bit-reproducible
  // in any engine — the oracle recomputes the identical codes.
  private val q71: Q = (s, d) =>
    embeddings(s, d)
      .select(col("vec_id"),
        column(graft.sim.QuantizeInt8(expression(col("embedding"))))
          .as("_q"))
      .select(col("vec_id"),
        col("_q.v_min").as("v_min"), col("_q.v_max").as("v_max"),
        col("_q.max_abs_err").as("max_abs_err"),
        round(col("_q.sum_sq_err"), 9).as("sse"),
        md5(to_binary(array_join(
          transform(col("_q.codes"), c => c.cast("string")), ","),
          lit("utf-8"))).as("codes_fp"))
      .orderBy(col("vec_id"))

  private lazy val q71Sql = {
    val codeOf = OracleSql.int8CodeSql _
    s"""
    WITH ${OracleSql.quantizeCtes},
    c AS (
      SELECT vec_id, nonfinite, mn, mx,
             list_transform(embedding, x -> ${codeOf("x")}) AS codes,
             list_transform(embedding, x ->
               abs(CAST(x AS DOUBLE) - (mn + ${codeOf("x")} * sc))) AS errs,
             list_transform(embedding, x ->
               (CAST(x AS DOUBLE) - (mn + ${codeOf("x")} * sc))
               * (CAST(x AS DOUBLE) - (mn + ${codeOf("x")} * sc))) AS sqs
      FROM s)
    SELECT vec_id,
           CASE WHEN nonfinite THEN NULL ELSE mn END AS v_min,
           CASE WHEN nonfinite THEN NULL ELSE mx END AS v_max,
           CASE WHEN nonfinite THEN NULL ELSE list_max(errs) END
             AS max_abs_err,
           CASE WHEN nonfinite THEN NULL ELSE round(list_sum(sqs), 9) END
             AS sse,
           CASE WHEN nonfinite THEN NULL
                ELSE md5(array_to_string(codes, ',')) END AS codes_fp
    FROM c ORDER BY vec_id"""
  }

  // ------------------------------------------------------------------- q72
  // Quantized retrieval with exact re-rank — how a 100 TB embedding store
  // actually serves ANN: stage 1 scans the int8 CODES (the 4:1-compressed
  // hot tier, reconstructed on the fly) for approx top-20 per query via
  // the bounded TopKByScore aggregate; stage 2 re-ranks only those
  // survivors against the full-precision floats (the cold tier — at scale
  // a point-lookup join, here 20 rows per query). Approx and exact sims
  // both round to 6 with (sim desc, id) total-order ties, so the stage
  // boundary is engine-unambiguous.
  private val RerankFrom = 20
  private val RerankTo = 10

  private val q72: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val corpus = emb
      .select(col("vec_id"),
        column(graft.sim.QuantizeInt8(expression(col("embedding"))))
          .as("_q"))
      .select(col("vec_id"), col("_q.v_min").as("_mn"),
        ((col("_q.v_max") - col("_q.v_min")) / 255.0).as("_sc"),
        col("_q.codes").as("_codes"))
      .withColumn("_approx", transform(col("_codes"),
        c => col("_mn") + c.cast("double") * col("_sc")))
      .select(col("vec_id"), col("_approx"))
    val qs = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top = Similarity.topK(qs, corpus, RerankFrom,
      cVec = "_approx")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("sim_exact"), col("vec_id"))
    top.select(col("q_id"), col("vec_id"))
      .join(broadcast(qs), Seq("q_id"))
      .join(emb, Seq("vec_id"))
      .withColumn("sim_exact",
        round(Similarity.cosine(col("q_vec"), col("embedding")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= RerankTo)
      .select(col("q_id"), col("rnk").cast("int").as("rnk"),
        col("vec_id"), col("sim_exact"))
      .orderBy(col("q_id"), col("rnk"))
  }

  private lazy val q72Sql = {
    s"""
    WITH ${OracleSql.quantizeCtes},
    ap AS (
      SELECT vec_id,
             CASE WHEN nonfinite THEN NULL
                  ELSE list_transform(embedding, x ->
                    mn + ${OracleSql.int8CodeSql("x")} * sc) END AS approx
      FROM s),
    qs AS (SELECT vec_id AS q_id, embedding AS q_vec
           FROM embeddings WHERE vec_id % 50 = 0),
    sim1 AS (
      SELECT qs.q_id, ap.vec_id,
             ${OracleSql.cos64Sql("qs.q_vec", "ap.approx")} AS sim
      FROM qs JOIN ap ON ap.vec_id <> qs.q_id),
    r1 AS (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id
               ORDER BY sim DESC, vec_id) AS rk
      FROM sim1 WHERE sim IS NOT NULL),
    surv AS (SELECT q_id, vec_id FROM r1 WHERE rk <= $RerankFrom),
    ec AS (SELECT vec_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb_d
           FROM e),
    sim2 AS (
      SELECT surv.q_id, surv.vec_id,
             ${OracleSql.cos64Sql("q.q_vec", "c.emb_d")} AS sim_exact
      FROM surv
        JOIN qs q ON q.q_id = surv.q_id
        JOIN ec c ON c.vec_id = surv.vec_id),
    r2 AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY sim_exact DESC, vec_id) AS INTEGER) AS rnk
      FROM sim2)
    SELECT q_id, rnk, vec_id, sim_exact
    FROM r2 WHERE rnk <= $RerankTo ORDER BY q_id, rnk"""
  }

  val queries: Map[String, Q] = Map(
    "q64_token_budget_mix" -> q64,
    "q65_shard_manifest" -> q65,
    "q66_gram_novelty" -> q66,
    "q67_bloom_decontaminate" -> q67,
    "q68_centroid_outlier" -> q68,
    "q69_leakage_safe_split" -> q69,
    "q70_curation_decision" -> q70,
    "q71_quantize_int8" -> q71,
    "q72_quantized_rerank" -> q72)

  val oracleSql: Map[String, String] = Map(
    "q64_token_budget_mix" -> q64Sql,
    "q65_shard_manifest" -> q65Sql,
    "q66_gram_novelty" -> q66Sql,
    "q67_bloom_decontaminate" -> q67Sql,
    "q68_centroid_outlier" -> q68Sql,
    "q69_leakage_safe_split" -> q69Sql,
    "q70_curation_decision" -> q70Sql,
    "q71_quantize_int8" -> q71Sql,
    "q72_quantized_rerank" -> q72Sql)
}
