package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Pack, Sample}
import graft.text.TextOps

/** Training-data curation batch three: reproducible stratified sampling,
  * concat-and-chunk sequence packing, corpus vocabulary statistics.
  */
object Pipeline3 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------- q51
  // Deterministic stratified sample — mixture weighting by language with
  // a keep-all stratum and a default rate. Pure scan-local filter on a
  // key hash: zero shuffle, reproducible across engines/retries (see
  // graft.ops.Sample). The rate table exercises every code path: a
  // fractional rate, the rate>=1 keep-all special case, and the default.
  private val SampleRates = Map("en" -> 0.25, "de" -> 0.5, "zh" -> 1.0)
  private val SampleDefault = 0.1

  private val q51: Q = (s, d) =>
    Sample.stratifiedHashSample(
        documents(s, d).select(col("doc_id"), col("lang"), col("source")),
        "doc_id", "lang", SampleRates, SampleDefault)
      .orderBy(col("doc_id"))

  private lazy val q51Sql = s"""
    SELECT doc_id, lang, source FROM documents
    WHERE ${Sample.stratifiedPredicateSql("doc_id", "lang",
      SampleRates, SampleDefault)}
    ORDER BY doc_id"""

  // ------------------------------------------------------------------- q52
  // Sequence packing: whitespace token counts (native TextStats pass),
  // concat-and-chunk per language shard with a 512-token budget
  // (start-offset attribution for straddling docs), then per-chunk
  // manifest rows. One window shuffle + one aggregation shuffle.
  private val PackBudget = 512L

  private val q52: Q = (s, d) => {
    val toks = FeatureMemo.features(s, d).select(col("doc_id"), col("lang"),
      col("n_tokens_ws").as("toks"))
    Pack.packSequences(toks, "lang", "doc_id", "toks", PackBudget)
      .groupBy(col("lang"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("chunk_tokens"))
      .orderBy(col("lang"), col("chunk_id"))
  }

  // DuckDB windowed sum yields HUGEINT -> cast back to BIGINT; integer
  // `//` keeps chunk arithmetic exact (no double rounding), mirroring
  // the Spark side's `div`.
  private val q52Sql = s"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+'))
                  END AS BIGINT) AS toks
      FROM documents),
    c AS (
      SELECT lang, toks,
             CAST(sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM t)
    SELECT lang, (cum - toks) // ${PackBudget} AS chunk_id,
           count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS chunk_tokens
    FROM c GROUP BY lang, chunk_id ORDER BY lang, chunk_id"""

  // ------------------------------------------------------------------- q53
  // Corpus vocabulary statistics (the scan you run before training a
  // tokenizer): term frequency + document frequency per word, top 20 by
  // (tf, word) — a deterministic total order, so the LIMIT boundary is
  // unambiguous. One explode scan, one Expand-style two-count
  // aggregation (partial map-side), TakeOrdered for the bounded output —
  // no global sort of the vocabulary.
  private val q53: Q = (s, d) =>
    GramMemo.words(s, d)
      .select(col("doc_id"), explode(col("words")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("tf"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(desc("tf"), col("word"))
      .limit(20)

  private lazy val q53Sql = s"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(${OracleSql.normSql}, ' ')) AS word
      FROM documents)
    SELECT word, count(*) AS tf, count(DISTINCT doc_id) AS doc_freq
    FROM w GROUP BY word ORDER BY tf DESC, word LIMIT 20"""

  // ------------------------------------------------------------------- q54
  // Embedding near-dup CLUSTERS — the embedding-modality twin of q50's
  // text clustering: hyperplane-sketch candidate pairs → exact cosine
  // verify (the EmbMemo pair artifact — sketch lineage runs once per
  // session, all equi-joins over the bounded sketch space) → connected
  // components over the verified edges (edge set persisted across
  // label-propagation rounds, convergence folded into the aggregation —
  // see DedupOps.connectedComponents).
  private val q54: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val edges = EmbMemo.pairs(s, d)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    graft.dedup.DedupOps
      .connectedComponents(emb.select(col("vec_id").as("id")), edges)
      .select(col("id").as("vec_id"), col("cluster_id"))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))).cast("long"))
      .withColumn("is_rep", col("vec_id") === col("cluster_id"))
      .orderBy(col("vec_id"))
  }

  private lazy val q54Sql = s"""
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
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS n_members,
           vec_id = cluster_id AS is_rep
    FROM cc ORDER BY vec_id"""

  // ------------------------------------------------------------------- q55
  // Per-source quality quota (domain caps, the RefinedWeb/CommonCrawl
  // curation shape: no single domain may dominate the training mix): keep
  // the top-N docs per source by (quality desc, doc_id asc). Ranking runs
  // through the bounded TopKByScore aggregate — each map task forwards at
  // most N rows per source to the shuffle, so a billion-doc domain costs
  // the same shuffle volume as a thousand-doc one (a row_number window
  // would funnel every domain's full doc list through one task).
  private val QuotaN = 10

  private val q55: Q = (s, d) => {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import graft.sim.TopKByScore
    val feats = FeatureMemo.features(s, d)
      .select(col("source"), col("doc_id"), col("quality"))
    val agg = column(TopKByScore(expression(col("quality")),
      expression(col("doc_id")), QuotaN).toAggregateExpression())
    feats.groupBy(col("source")).agg(agg.as("_top"))
      .select(col("source"), posexplode(col("_top")))
      .select(col("source"), col("col.id").as("doc_id"),
        col("col.score").as("quality"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("source"), col("rnk"))
  }

  private lazy val q55Sql = s"""
    WITH sc AS (
      SELECT source, doc_id,
             ${OracleSql.qualityScColsSql}
      FROM documents),
    q AS (SELECT source, doc_id, ${OracleSql.qualitySql} AS quality FROM sc),
    ranked AS (
      SELECT source, doc_id, quality,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY quality DESC, doc_id) AS INTEGER) AS rnk
      FROM q)
    SELECT source, doc_id, quality, rnk FROM ranked
    WHERE rnk <= $QuotaN ORDER BY source, rnk"""

  // ------------------------------------------------------------------- q56
  // Benchmark decontamination (the pretraining-hygiene pass): flag every
  // corpus doc sharing any word-8-gram with the held-out eval set (here:
  // doc_id % 10 = 0). The eval gram set is SMALL by construction (eval
  // suites are thousands of docs, not billions), so the probe is a
  // broadcast join against the exploded corpus grams — one scan, no
  // shuffle of corpus data, and the left join keeps zero-hit docs without
  // a second pass.
  private val DecontamN = 8

  private val q56: Q = (s, d) => {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    // NGramArray = one native normalize→split→gram pass per doc (sorted
    // distinct, and n_hits counts DISTINCT shared grams, so order is
    // irrelevant); the HOF slice/array_join formulation was 4x slower.
    val docs = documents(s, d).select(col("doc_id"),
      column(graft.dedup.NGramArray(expression(col("text")), DecontamN))
        .as("_g"))
    val evalGrams = docs.filter(col("doc_id") % 10 === 0)
      .select(explode(col("_g")).as("gram")).distinct()
      .withColumn("_hit", lit(1))
    docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), explode(col("_g")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("_hit")).as("n_hits"))
      .withColumn("is_clean", col("n_hits") === 0)
      .orderBy(col("doc_id"))
  }

  private lazy val q56Sql = s"""
    WITH nd AS (
      SELECT doc_id, string_split(${OracleSql.normSql}, ' ') AS w
      FROM documents),
    g AS (SELECT doc_id, ${OracleSql.gramsSql(DecontamN)} AS gr FROM nd),
    ev AS (SELECT DISTINCT unnest(gr) AS gram FROM g WHERE doc_id % 10 = 0),
    cg AS (SELECT doc_id, unnest(gr) AS gram FROM g WHERE doc_id % 10 <> 0)
    SELECT cg.doc_id, CAST(count(ev.gram) AS BIGINT) AS n_hits,
           count(ev.gram) = 0 AS is_clean
    FROM cg LEFT JOIN ev ON cg.gram = ev.gram
    GROUP BY cg.doc_id ORDER BY cg.doc_id"""

  // ------------------------------------------------------------------- q57
  // Repetition ratio (the Gopher/Dolma "repeated n-gram fraction" quality
  // signal): 1 - distinct/total over word 3-grams. Pure scan-local
  // arithmetic — the gram multiset and its distinct count come from one
  // split pass, no shuffle, no join; at 100 TB this runs at scan speed
  // next to the other per-doc features.
  // The TOTAL 3-gram count needs no gram materialization at all: a text
  // of L words has max(L-3, 0) + 1 clamped slices = greatest(L-2, 1)
  // (the L=0 "empty text" case also lands on 1: splitting "" yields the
  // one-element [""] word list). L comes from the native TextStats pass
  // and the distinct count from the native NGramArray pass — the whole
  // query is two fused per-row expressions over one scan.
  private val q57: Q = (s, d) => {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    documents(s, d).select(col("doc_id"),
        greatest(TextOps.tokenCountWs(col("text")) - 2, lit(1L))
          .as("n_grams"),
        size(column(graft.dedup.NGramArray(expression(col("text")), 3)))
          .cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double")
          / col("n_grams").cast("double"), 6))
      .orderBy(col("doc_id"))
  }

  private lazy val q57Sql = s"""
    WITH nd AS (
      SELECT doc_id, string_split(${OracleSql.normSql}, ' ') AS w
      FROM documents),
    g AS (SELECT doc_id,
            list_transform(generate_series(0, greatest(len(w) - 3, 0)),
              i -> array_to_string(w[i+1:i+3], ' ')) AS ag
          FROM nd)
    SELECT doc_id, CAST(len(ag) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(ag)) AS BIGINT) AS n_distinct,
           round(1.0 - CAST(len(list_distinct(ag)) AS DOUBLE)
             / CAST(len(ag) AS DOUBLE), 6) AS rep_ratio
    FROM g ORDER BY doc_id"""

  val queries: Map[String, Q] = Map(
    "q51_stratified_sample" -> q51,
    "q52_sequence_packing" -> q52,
    "q53_vocab_stats" -> q53,
    "q54_embedding_clusters" -> q54,
    "q55_source_quota" -> q55,
    "q56_decontaminate" -> q56,
    "q57_repetition_ratio" -> q57)

  val oracleSql: Map[String, String] = Map(
    "q51_stratified_sample" -> q51Sql,
    "q52_sequence_packing" -> q52Sql,
    "q53_vocab_stats" -> q53Sql,
    "q54_embedding_clusters" -> q54Sql,
    "q55_source_quota" -> q55Sql,
    "q56_decontaminate" -> q56Sql,
    "q57_repetition_ratio" -> q57Sql)
}
