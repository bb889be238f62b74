package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Batch seventeen: the monitoring-and-scheduling layer of a training
  * run — q131 mergeable log-linear quantile sketches over event values
  * (the DDSketch shape: Masson, Rim & Lee, VLDB 2019 — relative-error
  * quantiles from a FIXED-width bucket histogram, so per-type p50/p90/p99
  * needs constant state per group no matter how many distinct values the
  * metric takes), q132 second-order event-path mining (which 3-step
  * journeys happen MORE than their first-order Markov transitions
  * predict — the funnels q99 checks are hypothesized a priori; q132
  * discovers them), and q133 curriculum phase assignment (split the
  * corpus into quality-quartile training phases with token budgets —
  * the schedule a curriculum-learning run feeds its sampler — WITHOUT a
  * global sort: thresholds come from a bounded score histogram and ride
  * a broadcast back into the scan).
  */
object Pipeline17 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------ q131
  // DDSketch-style quantiles per event type. The value domain is doubles
  // (latency/amount-like, unbounded distinct values at 100 TB); exact
  // per-group quantiles would carry per-distinct-value state. The sketch
  // buckets fix that: integer cents c = floor(100·value), then log-linear
  // buckets — c < 8 exact, else octave o = bit-length(c) with 8
  // sub-buckets of width 2^(o-4), i.e. bucket lower bound
  // lb = ((c·8) div 2^(o-1)) · 2^(o-4). At most 8 buckets per octave →
  // ≤ 8·64 buckets per group EVER, and the bucket histogram is a plain
  // count aggregate: map-side combinable, mergeable across shards/days
  // by construction (the q128 stored-artifact fold applies verbatim).
  // Quantiles are read off the cumulative bucket histogram (type-1, all
  // integer arithmetic — the q110 rule); the reported lower bound
  // under-estimates the exact quantile by < 2^(o-4)/2^(o-1) = 12.5%
  // guaranteed. The exact side (from the cents histogram — bounded here,
  // NOT at 100 TB; it exists only to exhibit the error) joins on the
  // ≤|types|-row output, and the measured rel_err columns pin the
  // guarantee in both engines. All bucket arithmetic is integer
  // (bit-length via length(bin(c))), so Spark and DuckDB agree
  // bit-for-bit — no transcendental log in the bucket map.
  private val SketchCut = 8 // exact buckets below, log-linear from here

  /** Type-1 p50/p90/p99 off a (event_type, v, cnt) histogram: cumulative
    * + total windows over the SAME per-type sorted frame (one exchange,
    * no self-join), then min-v-reaching-ceil(q·tot) — integer-exact in
    * both engines.
    */
  private[queries] def t1Quantiles(hist: DataFrame, suffix: String): DataFrame = {
    val wc = Window.partitionBy(col("event_type")).orderBy(col("v"))
    val wt = Window.partitionBy(col("event_type"))
    def q(p: Int): Column =
      min(when(col("cum") >= expr(s"($p * tot + 99) div 100"), col("v")))
        .as(s"p${p}_$suffix")
    hist
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("tot", sum(col("cnt")).over(wt))
      .groupBy(col("event_type"))
      .agg(max(col("tot")).cast("long").as(s"tot_$suffix"),
        q(50), q(90), q(99))
  }

  // One definition for the bucket map across the aggregate, the
  // relational form and the oracle — graft.dedup.Dd generates all
  // three dialects, so they cannot drift.
  private val bucketLbSql = graft.dedup.Dd.bucketLbSqlExpr("c")

  /** q131's core over an explicit (event_type, value) frame — public for
    * the hand-fixture spec (planted integer distribution → closed-form
    * quantiles and bucket bounds).
    */
  def valueQuantiles(ev: DataFrame): DataFrame = {
    val cents = ev.select(col("event_type"),
      floor(col("value") * 100).cast("long").as("c"))
    val hist = cents.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // exact + sketch read the same histogram pass
    val exact = t1Quantiles(hist.withColumnRenamed("c", "v"), "ex")
    val sketch = t1Quantiles(
      hist.withColumn("v", expr(bucketLbSql))
        .groupBy(col("event_type"), col("v"))
        .agg(sum(col("cnt")).as("cnt")), "sk")
    def err(p: Int): Column =
      round((col(s"p${p}_ex") - col(s"p${p}_sk")) / col(s"p${p}_ex"), 6)
        .as(s"rel_err_p$p")
    exact.join(sketch, Seq("event_type"))
      .select(col("event_type"), col("tot_ex").as("n_events"),
        col("p50_ex").as("p50_exact"), col("p50_sk").as("p50_sketch"),
        col("p90_ex").as("p90_exact"), col("p90_sk").as("p90_sketch"),
        col("p99_ex").as("p99_exact"), col("p99_sk").as("p99_sketch"),
        err(50), err(90), err(99))
      .orderBy(col("event_type"))
  }

  private val q131: Q = (s, d) =>
    valueQuantiles(eventsMicros(s, d).select(col("event_type"), col("value")))

  private lazy val q131Sql = {
    val lb = graft.dedup.Dd.bucketLbDuckSql("c")
    def qsel(p: Int, suf: String) =
      s"min(CASE WHEN cum >= ($p * tot + 99) // 100 THEN v END) AS p${p}_$suf"
    def cum(src: String) = s"""SELECT event_type, v, cnt,
          sum(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum,
          sum(cnt) OVER (PARTITION BY event_type) AS tot
        FROM $src"""
    s"""
    WITH ce AS (SELECT event_type,
                  CAST(floor(value * 100) AS BIGINT) AS c FROM events),
    h AS (SELECT event_type, c, CAST(count(*) AS BIGINT) AS cnt
          FROM ce GROUP BY 1, 2),
    hx AS (SELECT event_type, c AS v, cnt FROM h),
    hs AS (SELECT event_type, $lb AS v, CAST(sum(cnt) AS BIGINT) AS cnt
           FROM h GROUP BY 1, 2),
    ex AS (SELECT event_type, CAST(max(tot) AS BIGINT) AS n_events,
             ${qsel(50, "ex")}, ${qsel(90, "ex")}, ${qsel(99, "ex")}
           FROM (${cum("hx")}) GROUP BY event_type),
    sk AS (SELECT event_type,
             ${qsel(50, "sk")}, ${qsel(90, "sk")}, ${qsel(99, "sk")}
           FROM (${cum("hs")}) GROUP BY event_type)
    SELECT ex.event_type, n_events,
           p50_ex AS p50_exact, p50_sk AS p50_sketch,
           p90_ex AS p90_exact, p90_sk AS p90_sketch,
           p99_ex AS p99_exact, p99_sk AS p99_sketch,
           round((p50_ex - p50_sk) / p50_ex, 6) AS rel_err_p50,
           round((p90_ex - p90_sk) / p90_ex, 6) AS rel_err_p90,
           round((p99_ex - p99_sk) / p99_ex, 6) AS rel_err_p99
    FROM ex JOIN sk ON ex.event_type = sk.event_type
    ORDER BY ex.event_type"""
  }

  // ------------------------------------------------------------------ q132
  // Second-order event-path mining: every consecutive 3-step path in a
  // user's (ts, event_id)-ordered history (the q101 total-order rule),
  // with its second-order lift — how much more often a→b→c happens than
  // the first-order Markov chain predicts from its own pair counts:
  // lift = [n(abc)/n(ab)] / [n(bc)/n(b)] = n(abc)·n(b) / (n(ab)·n(bc)).
  // lift ≫ 1 = a genuine 3-step journey (the funnels q99 tests were
  // GIVEN; this finds them); lift ≈ 1 = b→c doesn't care how the user
  // reached b. Scale shape: ONE exchange on user_id feeds both window
  // leads (adjacency is per-user by definition — the sessionize bound);
  // triple/pair/single counts are map-side-combinable aggregates onto
  // ≤|types|³ keys; and the pair/single tables (≤|types|² rows) ride
  // broadcasts back onto the triples — nothing after the one window
  // shuffle touches corpus-sized data.
  /** q132's core over an explicit (user_id, ts_t, event_id, event_type)
    * frame — public for the hand-fixture spec (planted journeys →
    * closed-form lift arithmetic).
    */
  def eventPaths(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_t"), col("event_id"))
    val seq = ev
      .select(col("user_id"), col("ts_t"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(byUser))
      .withColumn("e3", lead(col("e1"), 2).over(byUser))
      .localCheckpoint() // singles/pairs/triples share the one window pass
    val singles = seq.groupBy(col("e1").as("b")).agg(count(lit(1)).as("nb"))
    val pairs = seq.filter(col("e2").isNotNull)
      .groupBy(col("e1").as("pa"), col("e2").as("pb"))
      .agg(count(lit(1)).as("np"))
    val triples = seq.filter(col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
    triples
      .join(broadcast(pairs.select(col("pa").as("e1"), col("pb").as("e2"),
        col("np").as("n12"))), Seq("e1", "e2"))
      .join(broadcast(pairs.select(col("pa").as("e2"), col("pb").as("e3"),
        col("np").as("n23"))), Seq("e2", "e3"))
      .join(broadcast(singles.select(col("b").as("e2"), col("nb"))),
        Seq("e2"))
      .select(col("e1"), col("e2"), col("e3"), col("n"), col("n_users"),
        // double BEFORE the multiplies: Long n·nb / n12·n23 would wrap
        // silently at ~1e11 counts (100 TB scale) where DuckDB raises
        round(col("n").cast("double") * col("nb") /
          (col("n12").cast("double") * col("n23")), 6)
          .as("lift"))
      .orderBy(col("e1"), col("e2"), col("e3"))
  }

  private val q132: Q = (s, d) => eventPaths(eventsMicros(s, d))

  private lazy val q132Sql = """
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             event_type AS e1 FROM events),
    seq AS (
      SELECT user_id, e1,
             lead(e1, 1) OVER w AS e2,
             lead(e1, 2) OVER w AS e3
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    singles AS (SELECT e1 AS b, CAST(count(*) AS BIGINT) AS nb
                FROM seq GROUP BY 1),
    pairs AS (SELECT e1 AS pa, e2 AS pb, CAST(count(*) AS BIGINT) AS np
              FROM seq WHERE e2 IS NOT NULL GROUP BY 1, 2),
    triples AS (SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
                FROM seq WHERE e3 IS NOT NULL GROUP BY 1, 2, 3)
    SELECT t.e1, t.e2, t.e3, t.n, t.n_users,
           round(CAST(t.n AS DOUBLE) * s.nb
                 / (CAST(p12.np AS DOUBLE) * p23.np), 6) AS lift
    FROM triples t
      JOIN pairs p12 ON p12.pa = t.e1 AND p12.pb = t.e2
      JOIN pairs p23 ON p23.pa = t.e2 AND p23.pb = t.e3
      JOIN singles s ON s.b = t.e2
    ORDER BY t.e1, t.e2, t.e3"""

  // ------------------------------------------------------------------ q133
  // Curriculum phase assignment: split the corpus into four
  // quality-quartile phases (phase 0 = top quartile — train on clean
  // text first, anneal onto the noisier tail) and report each phase's
  // doc count, token budget and mean quality. The naive plan global-sorts
  // the corpus by score and ntile()s it — a total order over every row,
  // the one window shape this board bans at scale. Instead: per-score
  // HISTOGRAM (bounded by the 6-decimal score space, the q110 argument —
  // the global window below sorts histogram rows, not docs), type-1
  // quartile thresholds off its cumulative, then the 1-row threshold
  // table rides a broadcast back into the doc scan and phase assignment
  // is a scan-local CASE — no doc row ever shuffles for its phase. Mean
  // quality sums integer micro-units (score is already 6-dp), so the
  // cross-partition sum is order-independent in both engines exactly.
  /** q133's core over an explicit (qs, n_tok) frame — public for the
    * hand-fixture spec (planted score ladder → closed-form quartiles).
    */
  def curriculumPhases(scored: DataFrame): DataFrame = {
    val sc = scored.select(col("qs"), col("n_tok"))
      .localCheckpoint() // histogram + phase assignment share the scan
    val hist = sc.groupBy(col("qs")).agg(count(lit(1)).as("cnt"))
    // global window over the bounded score histogram (≤10^6 rows by
    // construction, independent of corpus size)
    val wc = Window.orderBy(col("qs"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def thr(p: Int): Column =
      min(when(col("cum") >= expr(s"($p * tot + 99) div 100"), col("qs")))
        .as(s"t$p")
    val thresholds = hist
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("tot", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .agg(thr(25), thr(50), thr(75))
    sc.crossJoin(broadcast(thresholds))
      .withColumn("phase",
        when(col("qs") >= col("t75"), 0)
          .when(col("qs") >= col("t50"), 1)
          .when(col("qs") >= col("t25"), 2)
          .otherwise(3))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("qs")).as("qs_lo"),
        max(col("qs")).as("qs_hi"),
        sum(round(col("qs") * 1e6).cast("long")).as("qs_micro"))
      .select(col("phase"), col("n_docs"), col("n_tokens"),
        col("qs_lo"), col("qs_hi"),
        round(col("qs_micro") / 1e6 / col("n_docs"), 6).as("mean_qs"))
      .orderBy(col("phase"))
  }

  private val q133: Q = (s, d) =>
    curriculumPhases(FeatureMemo.features(s, d).select(
      round(col("quality"), 6).as("qs"),
      col("n_tokens_ws").cast("long").as("n_tok")))

  private lazy val q133Sql = s"""
    WITH raw AS (SELECT ${OracleSql.qualityScColsSql},
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END
                     AS n_tok
                 FROM documents),
    sc AS (SELECT ${OracleSql.qualitySql} AS qs,
                  CAST(n_tok AS BIGINT) AS n_tok FROM raw),
    hist AS (SELECT qs, CAST(count(*) AS BIGINT) AS cnt
             FROM sc GROUP BY 1),
    cum AS (SELECT qs, cnt,
              sum(cnt) OVER (ORDER BY qs
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              sum(cnt) OVER () AS tot
            FROM hist),
    thr AS (SELECT
              min(CASE WHEN cum >= (25 * tot + 99) // 100 THEN qs END) AS t25,
              min(CASE WHEN cum >= (50 * tot + 99) // 100 THEN qs END) AS t50,
              min(CASE WHEN cum >= (75 * tot + 99) // 100 THEN qs END) AS t75
            FROM cum),
    ph AS (SELECT CASE WHEN qs >= t75 THEN 0
                       WHEN qs >= t50 THEN 1
                       WHEN qs >= t25 THEN 2
                       ELSE 3 END AS phase, qs, n_tok
           FROM sc CROSS JOIN thr)
    SELECT phase, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(qs) AS qs_lo, max(qs) AS qs_hi,
           round(CAST(sum(CAST(round(qs * 1e6) AS BIGINT)) AS BIGINT)
             / 1e6 / count(*), 6) AS mean_qs
    FROM ph GROUP BY phase ORDER BY phase"""

  val queries: Map[String, Q] = Map(
    "q131_ddsketch_quantiles" -> q131,
    "q132_event_paths" -> q132,
    "q133_curriculum_phases" -> q133)

  val oracleSql: Map[String, String] = Map(
    "q131_ddsketch_quantiles" -> q131Sql,
    "q132_event_paths" -> q132Sql,
    "q133_curriculum_phases" -> q133Sql)
}
