package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Similarity
import graft.text.Retrieval

/** Batch eighteen: corpus-quality and retrieval diagnostics a curation
  * team runs alongside the dedup/retrieval stack — q134 Gopher-style
  * intra-document repetition metrics (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * App. A1.1: repetitive docs are the classic quality filter the
  * length/punct heuristics of q38 miss), q135 MMR-diversified top-k
  * retrieval (Carbonell & Goldstein 1998 — the dedup counterpart ON the
  * result list: relevance minus redundancy), q136 the dedup-method
  * agreement matrix (exact vs MinHash vs SimHash verdicts per doc — the
  * calibration table that says which cheap method can stand in for
  * which expensive one), q137 near-dup cluster source-mix entropy
  * (cross-source duplication = syndication/scraper overlap; pure
  * clusters = within-source boilerplate), and q138 per-source n-gram
  * diversity (type-token ratios — the collapse signal for a source
  * whose scraper started emitting templated text).
  */
object Pipeline18 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------ q134
  // Intra-doc repetition: for each doc over the session words artifact,
  // the duplicate-2/3-gram fractions (1 - distinct/total) and the
  // top-2-gram mass (count of the most frequent 2-gram / total). ALL
  // in-row: gram arrays, distinct counts, and the max-multiplicity (a
  // run-length fold over the SORTED gram array — max run == max
  // multiplicity) are higher-order functions inside the scan, so the
  // corpus never shuffles and the query is one pass at any scale —
  // repetition is a per-doc property, and the plan says so. Gram
  // construction uses the house clamp (short docs yield one whole-doc
  // gram; the NGramArray/oracle rule), so fractions are never null.
  private val RepDup2Max = 0.20
  private val RepDup3Max = 0.18
  private val RepTop2Max = 0.20

  /** q134's core over an explicit (doc_id, words) frame — public for
    * the hand-fixture spec (planted repetitions → closed-form
    * fractions).
    */
  def repetitionMetrics(words: DataFrame): DataFrame = {
    val w = col("words")
    def gramArr(n: Int): Column =
      transform(sequence(lit(0), greatest(size(w) - n, lit(0))),
        i => array_join(slice(w, i + 1, lit(n)), " "))
    // max multiplicity = longest run over the sorted array: one fold,
    // no per-doc explode+groupBy (which would shuffle corpus grams)
    def maxMult(g: Column): Column =
      aggregate(array_sort(g),
        struct(lit("").as("p"), lit(0L).as("r"), lit(0L).as("m")),
        (acc, x) => {
          val r = when(x === acc.getField("p"), acc.getField("r") + 1L)
            .otherwise(lit(1L))
          struct(x.as("p"), r.as("r"),
            greatest(acc.getField("m"), r).as("m"))
        },
        acc => acc.getField("m"))
    words
      .withColumn("g2", gramArr(2))
      .withColumn("g3", gramArr(3))
      .select(col("doc_id"),
        size(w).cast("long").as("n_words"),
        size(col("g2")).cast("long").as("n_2grams"),
        round(lit(1.0) -
          size(array_distinct(col("g2"))).cast("double") / size(col("g2")),
          6).as("dup_2gram_frac"),
        round(maxMult(col("g2")).cast("double") / size(col("g2")), 6)
          .as("top_2gram_frac"),
        round(lit(1.0) -
          size(array_distinct(col("g3"))).cast("double") / size(col("g3")),
          6).as("dup_3gram_frac"))
      .withColumn("is_repetitive",
        when(col("dup_2gram_frac") > RepDup2Max ||
          col("dup_3gram_frac") > RepDup3Max ||
          col("top_2gram_frac") > RepTop2Max, 1L).otherwise(0L))
      .orderBy(col("doc_id"))
  }

  private val q134: Q = (s, d) =>
    repetitionMetrics(GramMemo.words(s, d).select(col("doc_id"), col("words")))

  private lazy val q134Sql = {
    def rawGrams(n: Int) =
      s"""list_transform(generate_series(0, greatest(len(w) - $n, 0)),
            i -> array_to_string(w[i+1:i+$n], ' '))"""
    s"""
    WITH nd AS (SELECT doc_id, string_split(${OracleSql.normSql}, ' ') AS w
                FROM documents),
    gg AS (SELECT doc_id, len(w) AS n_words,
             ${rawGrams(2)} AS g2, ${rawGrams(3)} AS g3 FROM nd),
    t2 AS (SELECT doc_id, g, count(*) AS c
           FROM (SELECT doc_id, unnest(g2) AS g FROM gg) GROUP BY 1, 2),
    top2 AS (SELECT doc_id, max(c) AS mc FROM t2 GROUP BY 1),
    m AS (SELECT gg.doc_id,
            CAST(n_words AS BIGINT) AS n_words,
            CAST(len(g2) AS BIGINT) AS n_2grams,
            round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6)
              AS dup_2gram_frac,
            round(CAST(mc AS DOUBLE) / len(g2), 6) AS top_2gram_frac,
            round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6)
              AS dup_3gram_frac
          FROM gg JOIN top2 ON top2.doc_id = gg.doc_id)
    SELECT *, CAST(CASE WHEN dup_2gram_frac > $RepDup2Max
                     OR dup_3gram_frac > $RepDup3Max
                     OR top_2gram_frac > $RepTop2Max
                   THEN 1 ELSE 0 END AS BIGINT) AS is_repetitive
    FROM m ORDER BY doc_id"""
  }

  // ------------------------------------------------------------------ q135
  // Maximal-marginal-relevance re-ranking of the board's standard BM25
  // retrieval: greedily pick k results maximizing
  // λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s) — the classic
  // redundancy-penalized top-k (a plain top-k returns five near-copies
  // of the best hit; MMR returns the best hit plus what it does NOT
  // cover). Scale shape: relevance comes off the memoized BM25 table
  // (bounded k-heap, RetrievalMemo), the candidate pool is a FIXED ≤20
  // rows, the pool's pairwise cosine matrix (≤380 rows) computes in the
  // engine with the native DotCosine, and only the greedy argmax — pure
  // comparisons over ≤20·10 rounded doubles, no corpus data — folds on
  // the driver (the SURVEY §7 bounded-fold rule; same class as the
  // ≤140-row curve folds). Every input to the fold is rounded to 6dp in
  // the ENGINE first, so the driver does no float derivation an engine
  // could disagree with; the DuckDB oracle replays the greedy loop as a
  // recursive CTE over the identical rounded inputs.
  private val MmrPool = 20
  private val MmrK = 10
  private val MmrLambda = 0.7

  /** The greedy MMR fold over bounded, pre-rounded inputs — public for
    * the hand-fixture spec.
    */
  def mmrSelect(rel: Seq[(Long, Double)], sims: Map[(Long, Long), Double],
                k: Int, lambda: Double): Seq[(Long, Long, Double, Double)] = {
    // BigDecimal.valueOf (shortest decimal repr), NOT new BigDecimal
    // (exact binary expansion): Spark's round() and DuckDB both round
    // the decimal form — e.g. 0.7·1.257249 − 0.3·0.177976 prints
    // 0.8266815 and must round UP to .826682, though its exact binary
    // value sits fractionally below the half
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val byId = rel.toMap
    val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Double)]
    while (out.length < math.min(k, rel.length)) {
      if (out.isEmpty) {
        // FIRST pick: argmax over RAW relevance (the oracle's base case
        // orders by score, not by the rounded λ·score — two 6-dp-
        // distinct scores can collapse to one rounded mmr, and the
        // tie-break would then pick a different seed than the oracle)
        val seed = rel.reduceLeft((a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a)
        picked += seed._1
        out += ((1L, seed._1, seed._2, r6(lambda * seed._2)))
      } else {
      val best = rel.iterator
        .filterNot { case (id, _) => picked.contains(id) }
        .map { case (id, r) =>
          // max over the sims that EXIST for (id, selected): may be
          // NEGATIVE (anti-correlated vectors — flooring at 0 would
          // over-reward picks), and a candidate with no embedding row
          // contributes no pairs at all — exactly the oracle's
          // coalesce(max(sim) WHERE list_contains, 0): absent rows are
          // ignored, an empty match set means penalty 0
          val pens = picked.iterator.flatMap(s => sims.get((id, s))).toSeq
          val pen = if (pens.isEmpty) 0.0 else pens.max
          (id, r6(lambda * r - (1 - lambda) * pen))
        }
        // argmax on (mmr desc, doc_id asc) — the oracle's ORDER BY
        .reduceLeft((a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a)
      picked += best._1
      out += ((out.length + 1L, best._1, byId(best._1), best._2))
      }
    }
    out.toSeq
  }

  private val q135: Q = (s, d) => {
    import s.implicits._
    val cand = Retrieval.rankedTopK(RetrievalMemo.bm25(s, d), MmrPool)
    val ce = cand.join(
      embeddings(s, d).select(col("vec_id").as("doc_id"), col("embedding")),
      Seq("doc_id"))
    val sims = ce.as("a").join(ce.as("b"),
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        round(Similarity.cosine(col("a.embedding"), col("b.embedding")), 6)
          .as("sim"))
    // bounded driver fold: ≤ MmrPool rel rows + ≤ MmrPool² sim rows
    val rel = cand.select(col("doc_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .sortBy(_._1)
    val sm = sims.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    mmrSelect(rel, sm, MmrK, MmrLambda)
      .toDF("rnk", "doc_id", "rel", "mmr")
      .select(col("rnk"), col("doc_id"), col("rel"), col("mmr"))
      .orderBy(col("rnk"))
  }

  private lazy val q135Sql = {
    val lam = MmrLambda
    val oneMinus = 1 - MmrLambda
    s"""
    WITH RECURSIVE
    ${OracleSql.bm25ScoresSql(RetrievalMemo.Terms, RetrievalMemo.K1,
        RetrievalMemo.B).stripPrefix("WITH ")},
    cand AS (SELECT doc_id, score FROM
               (SELECT doc_id, score, row_number() OVER
                  (ORDER BY score DESC, doc_id) AS r FROM scores)
             WHERE r <= $MmrPool),
    ce AS (SELECT c.doc_id, c.score, e.embedding
           FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id),
    sims AS (SELECT a.doc_id AS sa, b.doc_id AS sb,
               ${OracleSql.cos64Sql("a.embedding", "b.embedding")} AS sim
             FROM ce a JOIN ce b ON a.doc_id <> b.doc_id),
    pick(k, id, mmr, ids) AS (
      SELECT 1,
             (SELECT doc_id FROM cand ORDER BY score DESC, doc_id LIMIT 1),
             round($lam * (SELECT score FROM cand
                           ORDER BY score DESC, doc_id LIMIT 1), 6),
             [(SELECT doc_id FROM cand ORDER BY score DESC, doc_id LIMIT 1)]
      UNION ALL
      SELECT k + 1, nxt.doc_id, nxt.m, list_append(ids, nxt.doc_id)
      FROM pick, LATERAL (
        SELECT c.doc_id,
               round($lam * c.score - $oneMinus * coalesce((
                 SELECT max(s.sim) FROM sims s
                 WHERE s.sa = c.doc_id AND list_contains(pick.ids, s.sb)),
                 0.0), 6) AS m
        FROM cand c WHERE NOT list_contains(pick.ids, c.doc_id)
        ORDER BY m DESC, c.doc_id LIMIT 1) nxt
      WHERE pick.k < $MmrK)
    SELECT CAST(k AS BIGINT) AS rnk, id AS doc_id,
           (SELECT score FROM cand WHERE cand.doc_id = pick.id) AS rel,
           mmr
    FROM pick ORDER BY rnk"""
  }

  // ------------------------------------------------------------------ q136
  // Dedup-method agreement matrix: per doc, three independent dup
  // verdicts — exact (shared normalized-text fingerprint), MinHash+LSH
  // verified at J ≥ 0.5 (the q50 edge set, off the session scoredPairs
  // artifact), SimHash within the adaptive Hamming ball (the q43 pair rule) — grouped into
  // the 2³ agreement table. This is the calibration readout a dedup
  // stack uses to decide which cheap method safely stands in for which
  // expensive one at 100 TB (e.g. SimHash-only recall of the MinHash
  // verdicts). Scale shape: each verdict family is its own already-
  // bounded board query (fp groupBy on 16-byte keys; the memoized
  // verified pair table; the Hamming ball over adaptive-width
  // signatures) and the final join is doc-keyed; output is ≤ 8 rows.
  private val AgreeJaccard = 0.5
  // the SimHash verdict follows the q43 pair rule — adaptive width AND
  // the radius that rides it (adaptiveSimhashDist; SIMHASH_RECALL.json)
  // — via the shared ClusterMemo.simhashSigs/simhashSigPairs artifacts;
  // the oracle mirrors both through the same width CTE

  /** Per-doc verdict flags of the three dedup methods — the shared base
    * of q136's agreement matrix and q149's per-source burden report.
    */
  private[graft] def dedupFlags(s: SparkSession, d: String): DataFrame = {
    // exact-dup verdicts ride the stored feature table's fingerprint
    val fp = FeatureMemo.features(s, d).select(col("doc_id"), col("fp"))
    val dupFp = fp.groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select(col("fp"))
    val eids = fp.join(dupFp, Seq("fp")).select(col("doc_id")).distinct()
    // one-pass member extraction (r11, guide §2.3): explode both pair
    // endpoints from a single read of the pinned artifact instead of a
    // two-branch union that deserializes every pinned partition twice
    val mh = ClusterMemo.scoredPairs(s, d)
      .filter(col("jaccard") >= AgreeJaccard)
    val mids = mh.select(explode(array(col("id_a"), col("id_b")))
      .as("doc_id")).distinct()
    // the SimHash verdict needs only MEMBERSHIP (is the doc in ≥1
    // adaptive-ball pair), which factors through the signature: a doc
    // is flagged iff its sig has a ≠-sig ball neighbor present, or ≥ 2
    // docs share its sig (the (s,s) diagonal needs two docs to make an
    // id_a < id_b pair). Reading the two sig-level artifacts (≤ 2^width
    // rows) replaces the r10 read of the DOC-pair table, which carries
    // the n²/2^width background-collision volume (6.6M rows at sf0.1,
    // ~140M at the ×100 rung) — pair-set membership identical
    // (DedupClusterSpec pins it against the pair-table derivation).
    val sigs = ClusterMemo.simhashSigs(s, d)._2
    val nearSigs = ClusterMemo.simhashSigPairs(s, d)
      .filter(col("s1") =!= col("s2"))
      .select(col("s1").as("simhash")).distinct()
    val multiSigs = sigs.groupBy(col("simhash"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
      .select(col("simhash"))
    val dupSigs = nearSigs.unionByName(multiSigs).distinct()
    // no .distinct() here (unlike eids/mids): simhash_sigs is one row
    // per doc_id BY CONSTRUCTION (withSimhash is a per-row projection
    // of the documents table, whose doc_id is the primary key), so the
    // join cannot fan out — dupSigs is distinct and the sketch side is
    // unique. A duplicated sketch row would mean a corrupted artifact,
    // which the store's corpus signature and DedupClusterSpec both gate.
    val sids = sigs.join(dupSigs, Seq("simhash")).select(col("doc_id"))
    def flag(ids: DataFrame, name: String): DataFrame =
      ids.withColumn(name, lit(1L))
    fp.select(col("doc_id"))
      .join(flag(eids, "_e"), Seq("doc_id"), "left")
      .join(flag(mids, "_m"), Seq("doc_id"), "left")
      .join(flag(sids, "_s"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_e"), lit(0L)).as("is_exact"),
        coalesce(col("_m"), lit(0L)).as("is_minhash"),
        coalesce(col("_s"), lit(0L)).as("is_simhash"))
  }

  private val q136: Q = (s, d) =>
    dedupFlags(s, d)
      .groupBy(col("is_exact"), col("is_minhash"), col("is_simhash"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("is_exact"), col("is_minhash"), col("is_simhash"))

  /** The (doc_id, is_exact, is_minhash, is_simhash) flag CTE chain —
    * shared by the q136 and q149 oracles (ends with CTE `fl`).
    */
  private[queries] lazy val dedupFlagsCtes = s"""
    ${OracleSql.textClusterCtes(AgreeJaccard)},
    fpx AS (SELECT doc_id, md5(n) AS fp FROM nd),
    dupfp AS (SELECT fp FROM fpx GROUP BY fp HAVING count(*) > 1),
    eids AS (SELECT DISTINCT doc_id FROM fpx JOIN dupfp USING (fp)),
    mids AS (SELECT DISTINCT doc_id FROM
               (SELECT id_a AS doc_id FROM edges
                UNION ALL SELECT id_b FROM edges)),
    st AS (SELECT doc_id, list_distinct(string_split(n, ' ')) AS ws FROM nd),
    sh AS (SELECT doc_id, ws, list_transform(ws, w -> md5(w)) AS hs FROM st),
    swsel AS (SELECT ${OracleSql.simhashWidthSql} AS w FROM documents),
    ssigf AS (SELECT doc_id,
                CAST(${OracleSql.simhashBitsSqlW(31)} AS BIGINT) AS sf
              FROM sh),
    ssig AS (SELECT doc_id,
               CAST(sf & ((CAST(1 AS BIGINT) << w) - 1) AS INTEGER)
                 AS simhash
             FROM ssigf, swsel),
    spairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM ssig a JOIN ssig b ON a.doc_id < b.doc_id
               CROSS JOIN swsel
               WHERE bit_count(xor(a.simhash, b.simhash))
                       <= ${OracleSql.simhashDistSql("swsel.w")}),
    sids AS (SELECT DISTINCT doc_id FROM
               (SELECT ia AS doc_id FROM spairs
                UNION ALL SELECT ib FROM spairs)),
    fl AS (SELECT d.doc_id,
             CASE WHEN e.doc_id IS NULL THEN 0 ELSE 1 END AS is_exact,
             CASE WHEN m.doc_id IS NULL THEN 0 ELSE 1 END AS is_minhash,
             CASE WHEN s.doc_id IS NULL THEN 0 ELSE 1 END AS is_simhash
           FROM documents d
             LEFT JOIN eids e ON e.doc_id = d.doc_id
             LEFT JOIN mids m ON m.doc_id = d.doc_id
             LEFT JOIN sids s ON s.doc_id = d.doc_id)"""

  private lazy val q136Sql = s"""
    WITH RECURSIVE $dedupFlagsCtes
    SELECT CAST(is_exact AS BIGINT) AS is_exact,
           CAST(is_minhash AS BIGINT) AS is_minhash,
           CAST(is_simhash AS BIGINT) AS is_simhash,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM fl GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  // ------------------------------------------------------------------ q137
  // Near-dup cluster source-mix entropy: for every cluster of ≥2 docs
  // (the q50 clustering, off the session artifact), the Shannon entropy
  // of its source distribution. Entropy 0 = within-source boilerplate
  // (fix the source's extractor); high entropy = cross-source
  // syndication (dedup globally, attribute to one canonical source —
  // the q85 decision, now quantified per cluster). Scale shape: rides
  // the memoized cluster labels, two source-keyed aggregates over
  // cluster-sized data, output bounded by cluster count.
  //
  // Determinism caveat (shared by q140/q144 and the q113 KL family):
  // the entropy is a float sum of ln() terms rounded at 6 dp — both the
  // per-term libm ln (the q24 pow precedent) and the ≤|sources|-term
  // summation order could in principle move an x.xxxxxx5-boundary sum
  // by one ulp between engines. Unlike the integer-sum metrics this
  // cannot be made bit-exact without banning ln; the term count is tiny
  // and boundary values have measure ~1e-10 per group, which the
  // long-green q113 precedent bears out.
  private val q137: Q = (s, d) => {
    val cl = ClusterMemo.clusters(s, d, threshold = 0.5)
      .filter(col("n_members") >= 2)
      .select(col("doc_id"), col("cluster_id"))
    val per = cl.join(documents(s, d).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("cluster_id"), col("source")).agg(count(lit(1)).as("c"))
    val tot = per.groupBy(col("cluster_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_sources"))
    per.join(tot, Seq("cluster_id"))
      .groupBy(col("cluster_id"))
      .agg(max(col("n")).cast("long").as("n_members"),
        max(col("n_sources")).cast("long").as("n_sources"),
        // + 0.0 normalizes the IEEE -0.0 a pure cluster's -sum yields
        // (p=1 → -(1·ln 1) = -0.0), which engines may print differently
        round(-sum((col("c") / col("n")) * log(col("c") / col("n")))
          + lit(0.0), 6).as("source_entropy"))
      .withColumn("is_pure",
        when(col("n_sources") === 1, 1L).otherwise(0L))
      .orderBy(col("cluster_id"))
  }

  private lazy val q137Sql = s"""
    WITH RECURSIVE ${OracleSql.textClusterCtes(0.5)},
    mem AS (SELECT cluster_id, count(*) AS n FROM cc GROUP BY 1
            HAVING count(*) >= 2),
    per AS (SELECT cc.cluster_id, d.source, count(*) AS c
            FROM cc JOIN mem USING (cluster_id)
              JOIN documents d ON d.doc_id = cc.doc_id
            GROUP BY 1, 2)
    SELECT cluster_id,
           CAST(sum(c) AS BIGINT) AS n_members,
           CAST(count(*) AS BIGINT) AS n_sources,
           round(-sum((CAST(c AS DOUBLE) / (SELECT n FROM mem m
                WHERE m.cluster_id = per.cluster_id))
              * ln(CAST(c AS DOUBLE) / (SELECT n FROM mem m
                WHERE m.cluster_id = per.cluster_id))) + 0.0, 6)
             AS source_entropy,
           CAST(CASE WHEN count(*) = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS is_pure
    FROM per GROUP BY cluster_id ORDER BY cluster_id"""

  // ------------------------------------------------------------------ q138
  // Per-source lexical diversity: word type-token ratio and distinct-
  // 3-gram ratio per source — the collapse alarm for a source whose
  // scraper degenerated into templates (diversity falls while volume
  // holds; q113's KL catches a SHIFT, this catches a NARROWING). Rides
  // the session words + leak-gram artifacts: one explode each with
  // map-side combine onto (source, term) keys — the only exchanges are
  // vocab-bounded, the corpus text is read zero times.
  private val q138: Q = (s, d) => {
    val ws = GramMemo.words(s, d)
      .select(col("source"), explode(col("words")).as("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("total_words"),
        countDistinct(col("w")).as("uniq_words"))
    val gs = GramMemo.leak(s, d)
      .select(col("source"), explode(col("gks")).as("gk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("total_grams"),
        countDistinct(col("gk")).as("uniq_grams"))
    val nd = GramMemo.words(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    nd.join(ws, Seq("source")).join(gs, Seq("source"))
      .select(col("source"), col("n_docs"),
        col("total_words"), col("uniq_words"),
        round(col("uniq_words").cast("double") / col("total_words"), 6)
          .as("word_ttr"),
        col("total_grams"), col("uniq_grams"),
        round(col("uniq_grams").cast("double") / col("total_grams"), 6)
          .as("gram_diversity"))
      .orderBy(col("source"))
  }

  private lazy val q138Sql = {
    val n = GramMemo.LeakN
    s"""
    WITH nd AS (SELECT doc_id, source,
                  string_split(${OracleSql.normSql}, ' ') AS w
                FROM documents),
    wx AS (SELECT source, unnest(w) AS word FROM nd),
    ws AS (SELECT source, CAST(count(*) AS BIGINT) AS total_words,
             CAST(count(DISTINCT word) AS BIGINT) AS uniq_words
           FROM wx GROUP BY 1),
    g AS (SELECT doc_id, source,
            list_distinct(list_transform(
              generate_series(0, greatest(len(w) - $n, 0)),
              i -> substr(md5(array_to_string(w[i+1:i+$n], ' ')), 1, 16)))
              AS gr
          FROM nd),
    gx AS (SELECT source, unnest(gr) AS gk FROM g),
    gs AS (SELECT source, CAST(count(*) AS BIGINT) AS total_grams,
             CAST(count(DISTINCT gk) AS BIGINT) AS uniq_grams
           FROM gx GROUP BY 1),
    cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1)
    SELECT cnt.source, n_docs, total_words, uniq_words,
           round(CAST(uniq_words AS DOUBLE) / total_words, 6) AS word_ttr,
           total_grams, uniq_grams,
           round(CAST(uniq_grams AS DOUBLE) / total_grams, 6)
             AS gram_diversity
    FROM cnt JOIN ws USING (source) JOIN gs USING (source)
    ORDER BY cnt.source"""
  }

  val queries: Map[String, Q] = Map(
    "q134_repetition_metrics" -> q134,
    "q135_mmr_rerank" -> q135,
    "q136_dedup_agreement" -> q136,
    "q137_cluster_source_entropy" -> q137,
    "q138_source_diversity" -> q138)

  val oracleSql: Map[String, String] = Map(
    "q134_repetition_metrics" -> q134Sql,
    "q135_mmr_rerank" -> q135Sql,
    "q136_dedup_agreement" -> q136Sql,
    "q137_cluster_source_entropy" -> q137Sql,
    "q138_source_diversity" -> q138Sql)
}
