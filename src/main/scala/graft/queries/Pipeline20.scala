package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch twenty: tuning diagnostics for the engine's own index and
  * estimator layers — q142 ANN bucket-occupancy audit (is the
  * hyperplane LSH index balanced enough to probe, or did the embedding
  * distribution collapse into a few buckets?), q143 MinHash estimator
  * calibration by similarity band (how far is the 8-hash Jaccard
  * estimate from the exact verify, binned by exact similarity — the
  * table that justifies the band/verify thresholds), and q144
  * first-order Markov transition entropy per event type (how
  * predictable is the next event given the current one — the
  * sequence-model-ability number behind the q132 path mining).
  */
object Pipeline20 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------ q142
  // LSH index occupancy: each vector's 8-bit hyperplane bucket (the q78
  // index key: 16-bit sketch masked to 256 buckets), then the bucket-
  // size distribution — used buckets, empty buckets, type-1 p50/p90
  // occupancy, and the heaviest bucket's share. A skewed index makes
  // q78/q119 probes quasi-quadratic (every probe lands in the fat
  // bucket) — this is the audit that catches it BEFORE the maxBucket
  // guard kills a job at scale. Shape: one scan computes buckets
  // scan-local; everything after aggregates ≤256 rows.
  private val q142: Q = (s, d) => {
    import graft.sim.Similarity
    val occ = embeddings(s, d)
      .select(Similarity.hyperplaneSketch16(col("embedding"), 64)
        .bitwiseAND(lit(255)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
    val wc = Window.orderBy(col("c"), col("bucket")) // ≤256 rows
    def q(p: Int) = min(when(col("cum") >= expr(s"($p * tot + 99) div 100"),
      col("c"))).as(s"occ_p$p")
    occ
      .withColumn("cum", count(lit(1)).over(
        wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .agg(count(lit(1)).as("n_used_buckets"),
        sum(col("c")).as("n_vectors"),
        q(50), q(90), max(col("c")).as("occ_max"))
      .select(col("n_used_buckets"),
        (lit(256L) - col("n_used_buckets")).as("n_empty_buckets"),
        col("n_vectors"), col("occ_p50"), col("occ_p90"), col("occ_max"),
        round(col("occ_max").cast("double") / col("n_vectors"), 6)
          .as("max_bucket_share"))
  }

  private lazy val q142Sql = s"""
    WITH b AS (SELECT CAST(${OracleSql.hyperplaneBitsSql(8)} AS BIGINT)
                 AS bucket
               FROM embeddings),
    occ AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c
            FROM b GROUP BY 1),
    cum AS (SELECT c,
              count(*) OVER (ORDER BY c, bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              count(*) OVER () AS tot
            FROM occ)
    SELECT CAST(count(*) AS BIGINT) AS n_used_buckets,
           CAST(256 - count(*) AS BIGINT) AS n_empty_buckets,
           CAST(sum(c) AS BIGINT) AS n_vectors,
           min(CASE WHEN cum >= (50 * tot + 99) // 100 THEN c END)
             AS occ_p50,
           min(CASE WHEN cum >= (90 * tot + 99) // 100 THEN c END)
             AS occ_p90,
           max(c) AS occ_max,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS max_bucket_share
    FROM cum"""

  // ------------------------------------------------------------------ q143
  // MinHash estimator calibration: every LSH-nominated pair carries the
  // 8-hash estimate AND the exact verify (the session scoredPairs
  // artifact — zero extra corpus work here); bin by exact similarity
  // (0.05 bins) and report the mean estimator error per bin. The error
  // sums in EXACT integer micro-units (both inputs are 6-dp by
  // construction), so cross-partition summation order cannot move the
  // mean — the q133 rule. This table is what justifies the band count
  // and verify threshold: a fat low-similarity bin with positive error
  // means the bands nominate junk the verify then pays for.
  private val q143: Q = (s, d) => {
    ClusterMemo.scoredPairs(s, d)
      // round() BEFORE the integer cast: both inputs are 6-dp so the
      // product is integral up to float error, but Spark's cast
      // TRUNCATES toward zero while DuckDB's rounds — an x.99999
      // residue would land in different integers without the round
      .select((floor(col("jaccard") * 20) / 20.0).as("bin_lo"),
        round((col("est_jaccard") - col("jaccard")) * 1e6, 0).cast("long")
          .as("err_micro"))
      .groupBy(col("bin_lo"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("err_micro")).as("sm"),
        sum(when(col("err_micro") >= 0, 1L).otherwise(0L)).as("over"))
      // the micro mean rounds half-away-from-zero in EXACT integer
      // arithmetic — round(sm/1e6/n, 6) is a double division whose
      // 6th-decimal boundary the engines can disagree on by one ulp
      // (observed at sf0.1); the integer form cannot
      .select(col("bin_lo"), col("n_pairs"),
        (expr("(2 * abs(sm) + n_pairs) div (2 * n_pairs)") *
          when(col("sm") < 0, -1L).otherwise(1L) / 1e6)
          .as("mean_est_err"),
        round(col("over").cast("double") / col("n_pairs"), 6)
          .as("overestimate_frac"))
      .orderBy(col("bin_lo"))
  }

  private lazy val q143Sql = {
    val ctes = OracleSql.textClusterCtes(0.0) // cand/g built, edges unused
    s"""
    WITH RECURSIVE $ctes,
    sj AS (SELECT c.id_a, c.id_b,
             round((${OracleSql.sigAgreeSql(8)}) / 8.0, 6) AS est,
             ${OracleSql.jaccard3Sql("ga.gr", "gb.gr")} AS jac
           FROM cand c
             JOIN sig a ON a.doc_id = c.id_a
             JOIN sig b ON b.doc_id = c.id_b
             JOIN g ga ON ga.doc_id = c.id_a
             JOIN g gb ON gb.doc_id = c.id_b),
    e AS (SELECT floor(jac * 20) / 20.0 AS bin_lo,
            CAST(round((est - jac) * 1e6, 0) AS BIGINT) AS err_micro
          FROM sj),
    s AS (SELECT bin_lo, CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(err_micro) AS BIGINT) AS sm,
            CAST(sum(CASE WHEN err_micro >= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS over
          FROM e GROUP BY bin_lo)
    SELECT bin_lo, n_pairs,
           (((2 * abs(sm) + n_pairs) // (2 * n_pairs))
             * (CASE WHEN sm < 0 THEN -1 ELSE 1 END)) / 1e6
             AS mean_est_err,
           round(CAST(over AS DOUBLE) / n_pairs, 6) AS overestimate_frac
    FROM s ORDER BY bin_lo"""
  }

  // ------------------------------------------------------------------ q144
  // Per-type Markov transition entropy: over each user's (ts, event_id)-
  // ordered stream (the q132 total-order rule), the entropy of the
  // next-event distribution given the current type, plus the modal next
  // type. H ≈ 0 = deterministic flows (funnels worth mining — q132);
  // H ≈ log|types| = memoryless noise. Shape: ONE user-keyed window
  // pass, then (a, b) counts onto ≤|types|² keys with map-side combine;
  // the entropy fold touches only that bounded table.
  /** q144's core over an explicit (user_id, ts_t, event_id, event_type)
    * frame — public for the hand-fixture spec (planted deterministic vs
    * uniform flows → closed-form entropies).
    */
  def markovEntropy(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_t"), col("event_id"))
    val pairs = ev
      .select(col("user_id"), col("ts_t"), col("event_id"),
        col("event_type").as("a"))
      .withColumn("b", lead(col("a"), 1).over(byUser))
      .filter(col("b").isNotNull)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val tot = pairs.groupBy(col("a"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_next"))
    val modal = pairs
      .withColumn("r", row_number().over(
        Window.partitionBy(col("a")).orderBy(col("c").desc, col("b"))))
      .filter(col("r") === 1)
      .select(col("a"), col("b").as("modal_next"),
        col("c").as("modal_c"))
    pairs.join(tot, Seq("a"))
      .groupBy(col("a"))
      .agg(max(col("n")).cast("long").as("n_transitions"),
        max(col("n_next")).cast("long").as("n_next_types"),
        round(-sum((col("c") / col("n")) * log(col("c") / col("n")))
          + lit(0.0), 6).as("next_entropy"))
      .join(modal, Seq("a"))
      .select(col("a").as("event_type"), col("n_transitions"),
        col("n_next_types"), col("next_entropy"), col("modal_next"),
        round(col("modal_c").cast("double") / col("n_transitions"), 6)
          .as("modal_frac"))
      .orderBy(col("event_type"))
  }

  private val q144: Q = (s, d) => markovEntropy(eventsMicros(s, d))

  private lazy val q144Sql = """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                 event_type AS a FROM events),
    seq AS (SELECT a, lead(a, 1) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) AS b
            FROM e),
    pairs AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
              FROM seq WHERE b IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT a, sum(c) AS n, count(*) AS n_next
            FROM pairs GROUP BY 1),
    modal AS (SELECT a, b AS modal_next, c AS modal_c FROM
                (SELECT a, b, c, row_number() OVER
                   (PARTITION BY a ORDER BY c DESC, b) AS r FROM pairs)
              WHERE r = 1),
    h AS (SELECT pairs.a,
            CAST(max(n) AS BIGINT) AS n_transitions,
            CAST(max(n_next) AS BIGINT) AS n_next_types,
            round(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n))
              + 0.0, 6) AS next_entropy
          FROM pairs JOIN tot ON tot.a = pairs.a GROUP BY pairs.a)
    SELECT h.a AS event_type, n_transitions, n_next_types, next_entropy,
           modal_next,
           round(CAST(modal_c AS DOUBLE) / n_transitions, 6) AS modal_frac
    FROM h JOIN modal ON modal.a = h.a
    ORDER BY event_type"""

  val queries: Map[String, Q] = Map(
    "q142_lsh_occupancy" -> q142,
    "q143_minhash_calibration" -> q143,
    "q144_markov_entropy" -> q144)

  val oracleSql: Map[String, String] = Map(
    "q142_lsh_occupancy" -> q142Sql,
    "q143_minhash_calibration" -> q143Sql,
    "q144_markov_entropy" -> q144Sql)
}
