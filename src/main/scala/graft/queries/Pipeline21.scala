package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Batch twenty-one: second-order curation audits — q145 per-source
  * correlation of the quality signals (are length, the heuristic
  * quality score, and the repetition fraction measuring the SAME thing
  * on this source, or do they carry independent information? — the
  * signal-redundancy audit behind any weighted quality gate), and q146
  * clustering threshold stability (Rand / adjusted-Rand index between
  * the J ≥ 0.5 and J ≥ 0.7 near-dup clusterings — how much does the
  * dedup decision actually depend on the threshold knob?).
  */
object Pipeline21 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------ q145
  // Pearson correlations from EXACT integer moments: the three signals
  // are integerized scan-local (chars; quality and dup-2-gram fraction
  // in 6-dp micro-units — both already 6-dp by construction), the five
  // sums per pair accumulate as DECIMAL(38,0) in Spark (sum(BIGINT) in
  // DuckDB is HUGEINT — neither can wrap), and the r formula is pure
  // scalar double arithmetic over those exact sums — no
  // summation-order dependence anywhere, so the engines agree to the
  // last bit before the final 6-dp round. One corpus scan; the only
  // exchange carries |sources| × 13 numbers.
  private def pearson(n: Column, sx: Column, sy: Column, sxx: Column,
                      syy: Column, sxy: Column): Column = {
    def d(c: Column) = c.cast("double")
    round((d(n) * d(sxy) - d(sx) * d(sy)) /
      sqrt((d(n) * d(sxx) - d(sx) * d(sx)) *
        (d(n) * d(syy) - d(sy) * d(sy))), 6)
  }

  private val q145: Q = (s, d) => {
    // rides the two stored artifacts instead of re-running the corpus
    // regexes: x (char length) and y (quality micro) come from the
    // feature table, w from the words table — one doc-keyed join of
    // checkpointed inputs, the bigram build scan-local over w
    val sc = FeatureMemo.features(s, d)
      .select(col("doc_id"), col("source"),
        col("n_chars").as("x"),
        round(round(col("quality"), 6) * 1e6, 0).cast("long").as("y"))
      .join(GramMemo.words(s, d).select(col("doc_id"),
        col("words").as("w")), Seq("doc_id"))
      .withColumn("g2",
        transform(sequence(lit(0), greatest(size(col("w")) - 2, lit(0))),
          i => array_join(slice(col("w"), i + 1, lit(2)), " ")))
      .select(col("source"), col("x"), col("y"),
        round(round(lit(1.0) -
          size(array_distinct(col("g2"))).cast("double") / size(col("g2")),
          6) * 1e6, 0).cast("long").as("z"))
    def dec(c: Column) = sum(c.cast("decimal(38,0)"))
    sc.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        dec(col("x")).as("sx"), dec(col("y")).as("sy"),
        dec(col("z")).as("sz"),
        dec(col("x") * col("x")).as("sxx"),
        dec(col("y") * col("y")).as("syy"),
        dec(col("z") * col("z")).as("szz"),
        dec(col("x") * col("y")).as("sxy"),
        dec(col("x") * col("z")).as("sxz"),
        dec(col("y") * col("z")).as("syz"))
      .select(col("source"), col("n").as("n_docs"),
        pearson(col("n"), col("sx"), col("sy"), col("sxx"), col("syy"),
          col("sxy")).as("r_len_quality"),
        pearson(col("n"), col("sx"), col("sz"), col("sxx"), col("szz"),
          col("sxz")).as("r_len_dup2"),
        pearson(col("n"), col("sy"), col("sz"), col("syy"), col("szz"),
          col("syz")).as("r_quality_dup2"))
      .orderBy(col("source"))
  }

  private lazy val q145Sql = s"""
    WITH raw AS (SELECT source, text, ${OracleSql.qualityScColsSql}
                 FROM documents),
    wd AS (SELECT source,
             CAST(length(text) AS BIGINT) AS x,
             CAST(round(${OracleSql.qualitySql} * 1e6, 0) AS BIGINT) AS y,
             string_split(${OracleSql.normSql}, ' ') AS w
           FROM raw),
    gz AS (SELECT source, x, y,
             list_transform(generate_series(0, greatest(len(w) - 2, 0)),
               i -> array_to_string(w[i+1:i+2], ' ')) AS g2
           FROM wd),
    sc AS (SELECT source, x, y,
             CAST(round(round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
               / len(g2), 6) * 1e6, 0) AS BIGINT) AS z
           FROM gz),
    m AS (SELECT source, count(*) AS n,
            sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
            sum(x * x) AS sxx, sum(y * y) AS syy, sum(z * z) AS szz,
            sum(x * y) AS sxy, sum(x * z) AS sxz, sum(y * z) AS syz
          FROM sc GROUP BY source)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
      round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
             (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
        AS r_len_quality,
      round((CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz) /
        sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
             (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)), 6)
        AS r_len_dup2,
      round((CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz) /
        sqrt((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) *
             (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)), 6)
        AS r_quality_dup2
    FROM m ORDER BY source"""

  // ------------------------------------------------------------------ q146
  // Threshold stability: the J ≥ 0.5 and J ≥ 0.7 clusterings (both off
  // the ONE session scoredPairs artifact — the second threshold costs
  // one more connected-components fold, zero corpus work) compared by
  // Rand and adjusted-Rand index (Hubert & Arabie 1985) from the
  // cluster contingency table. All pair counts C(n,2) are exact
  // BIGINTs (bound: a cluster of ≤ 4.3e9 members before C(n,2) wraps —
  // a dedup clustering past that is degenerate long before the
  // arithmetic is), sums accumulate as DECIMAL(38,0)/HUGEINT, and the
  // index formula is scalar double arithmetic over the exact sums.
  // RI ≈ 1 ⇒ the knob hardly matters; low ARI ⇒ the 0.5→0.7 choice is
  // re-deciding membership for a large pair mass and deserves a sweep.
  private val q146: Q = (s, d) => {
    def labels(t: Double, out: String) =
      ClusterMemo.clusters(s, d, threshold = t)
        .select(col("doc_id"), col("cluster_id").as(out))
    // INTEGER division (the product is always even): Spark's `/` on
    // longs returns DOUBLE, which silently loses exactness past 2^53 —
    // the bit-exactness contract below depends on C(n,2) staying a
    // BIGINT (bound: the n·(n−1) product wraps at n ≈ 3.0e9 members,
    // where DuckDB raises and a dedup clustering is degenerate anyway)
    def c2(name: String) = expr(s"($name * ($name - 1)) div 2")
    def dec(c: Column) = sum(c.cast("decimal(38,0)"))
    val ct = labels(0.5, "c1").join(labels(0.7, "c2"), Seq("doc_id"))
      .groupBy(col("c1"), col("c2")).agg(count(lit(1)).as("nij"))
      .localCheckpoint() // contingency feeds the three pair sums
    val sij = ct.agg(dec(c2("nij")).as("sPairs"),
      sum(col("nij")).as("n"),
      countDistinct(col("c1")).as("k1"),
      countDistinct(col("c2")).as("k2"))
    val sa = ct.groupBy(col("c1")).agg(sum(col("nij")).as("a"))
      .agg(dec(c2("a")).as("sa"))
    val sb = ct.groupBy(col("c2")).agg(sum(col("nij")).as("b"))
      .agg(dec(c2("b")).as("sb"))
    def dbl(c: Column) = c.cast("double")
    sij.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .withColumn("np", dbl(col("n")) * (dbl(col("n")) - 1) / 2)
      .withColumn("exp", dbl(col("sa")) * dbl(col("sb")) / col("np"))
      .select(col("n").cast("long").as("n_docs"),
        col("k1").cast("long").as("n_clusters_t05"),
        col("k2").cast("long").as("n_clusters_t07"),
        round((col("np") + lit(2) * dbl(col("sPairs")) - dbl(col("sa"))
          - dbl(col("sb"))) / col("np"), 6).as("rand_index"),
        round((dbl(col("sPairs")) - col("exp")) /
          ((dbl(col("sa")) + dbl(col("sb"))) / 2 - col("exp")), 6)
          .as("adjusted_rand"))
  }

  private lazy val q146Sql = s"""
    WITH RECURSIVE ${OracleSql.textClusterCtes(0.5, suffix = "05")},
    ${OracleSql.textClusterCtes(0.7, suffix = "07")},
    ct AS (SELECT a.cluster_id AS c1, b.cluster_id AS c2,
             CAST(count(*) AS BIGINT) AS nij
           FROM cc05 a JOIN cc07 b ON a.doc_id = b.doc_id
           GROUP BY 1, 2),
    sij AS (SELECT sum(nij * (nij - 1) // 2) AS sPairs, sum(nij) AS n,
              count(DISTINCT c1) AS k1, count(DISTINCT c2) AS k2
            FROM ct),
    sa AS (SELECT sum(a * (a - 1) // 2) AS sa FROM
             (SELECT sum(nij) AS a FROM ct GROUP BY c1)),
    sb AS (SELECT sum(b * (b - 1) // 2) AS sb FROM
             (SELECT sum(nij) AS b FROM ct GROUP BY c2))
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(k1 AS BIGINT) AS n_clusters_t05,
           CAST(k2 AS BIGINT) AS n_clusters_t07,
           round((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2
               + 2 * CAST(sPairs AS DOUBLE) - CAST(sa AS DOUBLE)
               - CAST(sb AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2), 6)
             AS rand_index,
           round((CAST(sPairs AS DOUBLE)
               - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2))
             / ((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / 2
               - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2)), 6)
             AS adjusted_rand
    FROM sij, sa, sb"""

  // ------------------------------------------------------------------ q147
  // Greedy submodular coverage selection (lazy-greedy facility
  // location, Nemhauser/Wolsey/Fisher 1978 — the (1−1/e) classic behind
  // data-subset selection): from the top-[[CovPool]] quality candidates,
  // pick [[CovK]] documents that greedily maximize cumulative DISTINCT
  // 3-gram coverage — the "most informative shortlist" op an annotation
  // or eval-set builder runs (top-k by quality alone returns ten
  // near-copies; coverage-greedy returns what together SPANS the pool).
  // Scale shape: the pool is a bounded k-heap (TopKByScore over the
  // quality scan), its gram sets come off the session leak artifact
  // (zero extra corpus derivations), and only the greedy argmax — set
  // sizes over ≤ CovPool collected gram arrays — folds on the driver
  // (the q135 bounded-fold rule). The oracle replays the greedy loop as
  // a recursive CTE whose marginal is a gram-level anti-join count.
  private val CovPool = 40
  private val CovK = 10

  /** The greedy coverage fold over bounded collected gram sets — public
    * for the hand-fixture spec.
    */
  def coverageSelect(cands: Seq[(Long, Set[String])], k: Int)
      : Seq[(Long, Long, Long, Long)] = {
    val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
    val covered = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    while (out.length < math.min(k, cands.length)) {
      val best = cands.iterator
        .filterNot { case (id, _) => picked.contains(id) }
        .map { case (id, gs) => (id, gs.count(g => !covered.contains(g))) }
        .reduceLeft((a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a)
      picked += best._1
      covered ++= cands.find(_._1 == best._1).get._2
      out += ((out.length + 1L, best._1, best._2.toLong, covered.size.toLong))
    }
    out.toSeq
  }

  private val q147: Q = (s, d) => {
    import s.implicits._
    import graft.text.Retrieval
    val scored = FeatureMemo.features(s, d).select(col("doc_id"),
      round(col("quality"), 6).as("score"))
    val pool = Retrieval.rankedTopK(scored, CovPool).select(col("doc_id"))
    val pg = pool.join(
      GramMemo.leak(s, d).select(col("doc_id"), col("gks")), Seq("doc_id"))
    // bounded driver fold: ≤ CovPool (doc, gram-set) rows
    val cands = pg.collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSet)).toSeq
      .sortBy(_._1)
    coverageSelect(cands, CovK)
      .toDF("rnk", "doc_id", "n_new_grams", "cum_coverage")
      .orderBy(col("rnk"))
  }

  private lazy val q147Sql = {
    val n = GramMemo.LeakN
    s"""
    WITH RECURSIVE
    raw AS (SELECT doc_id, text, ${OracleSql.qualityScColsSql}
            FROM documents),
    sc AS (SELECT doc_id, ${OracleSql.qualitySql} AS score FROM raw),
    pool AS (SELECT doc_id FROM
               (SELECT doc_id, row_number() OVER
                  (ORDER BY score DESC, doc_id) AS r FROM sc)
             WHERE r <= $CovPool),
    nd AS (SELECT p.doc_id,
             string_split(${OracleSql.normSql}, ' ') AS w
           FROM pool p JOIN documents USING (doc_id)),
    pg AS (SELECT doc_id,
             list_distinct(list_transform(
               generate_series(0, greatest(len(w) - $n, 0)),
               i -> substr(md5(array_to_string(w[i+1:i+$n], ' ')), 1, 16)))
               AS gr
           FROM nd),
    pgx AS (SELECT doc_id, unnest(gr) AS g FROM pg),
    pn AS (SELECT doc_id, CAST(len(gr) AS BIGINT) AS n_gr FROM pg),
    pick(k, id, n_new, ids) AS (
      SELECT 1, nxt.doc_id, nxt.n_gr, [nxt.doc_id]
      FROM (SELECT doc_id, n_gr FROM pn
            ORDER BY n_gr DESC, doc_id LIMIT 1) nxt
      UNION ALL
      SELECT k + 1, nxt.doc_id, nxt.nn, list_append(ids, nxt.doc_id)
      FROM pick, LATERAL (
        SELECT p.doc_id,
               p.n_gr - (SELECT count(DISTINCT a.g)
                         FROM pgx a JOIN pgx b ON a.g = b.g
                         WHERE a.doc_id = p.doc_id
                           AND list_contains(pick.ids, b.doc_id)) AS nn
        FROM pn p WHERE NOT list_contains(pick.ids, p.doc_id)
        ORDER BY nn DESC, p.doc_id LIMIT 1) nxt
      WHERE pick.k < $CovK)
    SELECT CAST(k AS BIGINT) AS rnk, id AS doc_id,
           CAST(n_new AS BIGINT) AS n_new_grams,
           CAST(sum(n_new) OVER (ORDER BY k) AS BIGINT) AS cum_coverage
    FROM pick ORDER BY rnk"""
  }

  // ------------------------------------------------------------------ q148
  // LSH recall audit: the exact prefix-filtered similarity join (q94's
  // PPJoin — provably COMPLETE at J ≥ 0.5 over the same 3-gram Jaccard)
  // is the ground truth; the banded-MinHash verified pair set (the
  // scoredPairs session artifact) is the candidate under audit. Per
  // 0.05 similarity band: true pairs, found pairs, measured recall, and
  // the closed-form banding theory 1 − (1 − s²)⁴ at the band midpoint
  // (r=2 rows/band, b=4 bands — the session LSH shape) — computed with
  // MULTIPLICATION only (((1−s²)²)², no libm pow), so both engines
  // agree bit-for-bit. q143 audits the estimator's VALUE error; this
  // audits the nomination's COVERAGE — together they are the evidence
  // behind the band/verify configuration. LSH-verified pairs are a
  // subset of the exact set by construction (same similarity, complete
  // ground truth), so recall ≤ 1 per band structurally.
  private val q148: Q = (s, d) => {
    val exact = ClusterMemo.exactPairs(s, d)
    val lsh = ClusterMemo.scoredPairs(s, d)
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), lit(1L).as("_hit"))
    val mid = col("bin_lo") + 0.025
    val miss = lit(1.0) - mid * mid
    exact.join(lsh, Seq("id_a", "id_b"), "left")
      .groupBy((floor(col("jaccard") * 20) / 20.0).as("bin_lo"))
      .agg(count(lit(1)).as("n_true"),
        count(col("_hit")).as("n_found"))
      .select(col("bin_lo"), col("n_true"), col("n_found"),
        round(col("n_found").cast("double") / col("n_true"), 6)
          .as("recall"),
        round(lit(1.0) - (miss * miss) * (miss * miss), 6)
          .as("theory_recall"))
      .orderBy(col("bin_lo"))
  }

  private lazy val q148Sql = s"""
    WITH RECURSIVE ${OracleSql.textClusterCtes(0.5, suffix = "l")},
    ${OracleSql.exactPairsCtes},
    hit AS (SELECT id_a, id_b, 1 AS h FROM edgesl),
    br AS (SELECT floor(ex.jaccard * 20) / 20.0 AS bin_lo,
             CAST(count(*) AS BIGINT) AS n_true,
             CAST(count(hit.h) AS BIGINT) AS n_found
           FROM ex LEFT JOIN hit USING (id_a, id_b)
           GROUP BY 1)
    SELECT bin_lo, n_true, n_found,
           round(CAST(n_found AS DOUBLE) / n_true, 6) AS recall,
           round(1.0 - ((1.0 - (bin_lo + 0.025) * (bin_lo + 0.025))
                      * (1.0 - (bin_lo + 0.025) * (bin_lo + 0.025)))
                    * ((1.0 - (bin_lo + 0.025) * (bin_lo + 0.025))
                      * (1.0 - (bin_lo + 0.025) * (bin_lo + 0.025))), 6)
             AS theory_recall
    FROM br ORDER BY bin_lo"""

  val queries: Map[String, Q] = Map(
    "q145_signal_correlation" -> q145,
    "q146_threshold_stability" -> q146,
    "q147_coverage_select" -> q147,
    "q148_lsh_recall" -> q148)

  val oracleSql: Map[String, String] = Map(
    "q145_signal_correlation" -> q145Sql,
    "q146_threshold_stability" -> q146Sql,
    "q147_coverage_select" -> q147Sql,
    "q148_lsh_recall" -> q148Sql)
}
