package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch nineteen: the event-telemetry monitoring trio — q139 DDSketch
  * shard-register fold (the q128 stored-artifact economics applied to
  * QUANTILES: per-day bucket histograms are the stored table, corpus
  * quantiles fold from them with zero event re-reads — exact, because
  * bucket-count addition is associative), q140 per-user behavioral
  * entropy (the event-stream twin of q137's source-mix entropy: bots
  * and stuck clients sit at entropy ≈ 0, scripted sweeps at max), and
  * q141 hourly burst detection (per-type hourly counts z-scored against
  * the type's own hourly distribution — the rate-anomaly flag the
  * streaming rate monitor raises live, here as the batch audit; all
  * moments come from EXACT integer sums so both engines agree
  * bit-for-bit before the one float division).
  */
object Pipeline19 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------ q139
  // DDSketch shard fold: the per-(type, day) bucket histogram is the
  // STORED artifact a telemetry pipeline keeps (≤ 8+8·60 rows per
  // shard, the q131 bound); corpus p50/p90/p99 then fold from stored
  // counts — never from events. fold == direct EXACTLY (count addition
  // is associative/commutative), and the query emits both sides plus a
  // `fold_exact` flag the oracle hard-codes TRUE — a fold bug turns
  // the row red (the q128 contract).
  private val q139: Q = (s, d) => {
    val ev = eventsMicros(s, d).select(col("event_type"),
      to_date(col("ts_t")).as("day"),
      floor(col("value") * 100).cast("long").as("c"))
    val shards = ev
      .withColumn("v", expr(graft.dedup.Dd.bucketLbSqlExpr("c")))
      .groupBy(col("event_type"), col("day"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // the stored per-day sketch table
    val folded = Pipeline17.t1Quantiles(
      shards.groupBy(col("event_type"), col("v"))
        .agg(sum(col("cnt")).as("cnt")), "fold")
    val direct = Pipeline17.t1Quantiles(
      ev.withColumn("v", expr(graft.dedup.Dd.bucketLbSqlExpr("c")))
        .groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("cnt")), "dir")
    val nsh = shards.groupBy(col("event_type"))
      .agg(countDistinct(col("day")).as("n_shards"))
    nsh.join(folded, Seq("event_type")).join(direct, Seq("event_type"))
      .select(col("event_type"), col("n_shards"),
        col("tot_fold").as("n_events"),
        col("p50_fold"), col("p90_fold"), col("p99_fold"),
        (col("tot_fold") === col("tot_dir") &&
          col("p50_fold") === col("p50_dir") &&
          col("p90_fold") === col("p90_dir") &&
          col("p99_fold") === col("p99_dir")).as("fold_exact"))
      .orderBy(col("event_type"))
  }

  private lazy val q139Sql = {
    val lb = graft.dedup.Dd.bucketLbDuckSql("c")
    def qsel(p: Int) =
      s"min(CASE WHEN cum >= ($p * tot + 99) // 100 THEN v END) AS p${p}_fold"
    s"""
    WITH ce AS (SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(floor(value * 100) AS BIGINT) AS c FROM events),
    h AS (SELECT event_type, $lb AS v, CAST(count(*) AS BIGINT) AS cnt
          FROM ce GROUP BY 1, 2),
    cum AS (SELECT event_type, v, cnt,
              sum(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum,
              sum(cnt) OVER (PARTITION BY event_type) AS tot
            FROM h),
    q AS (SELECT event_type, CAST(max(tot) AS BIGINT) AS n_events,
            ${qsel(50)}, ${qsel(90)}, ${qsel(99)}
          FROM cum GROUP BY event_type),
    days AS (SELECT event_type,
               CAST(count(DISTINCT day) AS BIGINT) AS n_shards
             FROM ce GROUP BY 1)
    SELECT d.event_type, d.n_shards, q.n_events,
           p50_fold, p90_fold, p99_fold, TRUE AS fold_exact
    FROM days d JOIN q ON q.event_type = d.event_type
    ORDER BY d.event_type"""
  }

  // ------------------------------------------------------------------ q140
  // Per-user behavioral entropy over event types. Scale shape: one
  // map-side-combinable (user, type) count, then a user-keyed fold —
  // the per-user term count is bounded by |types|, output is
  // user-bounded (the retention-cohort rule). The -0.0 a single-type
  // user's -sum yields is normalized with + 0.0 (q137 rule).
  private val q140: Q = (s, d) => {
    val per = eventsMicros(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val tot = per.groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_types"))
    per.join(tot, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(max(col("n")).cast("long").as("n_events"),
        max(col("n_types")).cast("long").as("n_types"),
        round(-sum((col("c") / col("n")) * log(col("c") / col("n")))
          + lit(0.0), 6).as("type_entropy"))
      .orderBy(col("user_id"))
  }

  private lazy val q140Sql = """
    WITH per AS (SELECT user_id, event_type, count(*) AS c
                 FROM events GROUP BY 1, 2),
    tot AS (SELECT user_id, sum(c) AS n, count(*) AS n_types
            FROM per GROUP BY 1)
    SELECT per.user_id,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(max(n_types) AS BIGINT) AS n_types,
           round(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n))
             + 0.0, 6) AS type_entropy
    FROM per JOIN tot ON tot.user_id = per.user_id
    GROUP BY per.user_id ORDER BY per.user_id"""

  // ------------------------------------------------------------------ q141
  // Hourly burst detection: each (type, hour) count z-scored against
  // the type's hourly-count distribution. Moments come from exact
  // integer sums (Σc, Σc², hour count), so mean/variance are derived
  // from identical BIGINTs in both engines and the single float
  // division cannot diverge; z is 6-dp-rounded BEFORE the burst flag so
  // an ulp can never flip a verdict. Scale shape: one
  // map-side-combinable (type, hour) count (bounded by types × hours),
  // a |types|-row moment table riding a broadcast back onto it.
  private val BurstZ = 2.0

  /** q141's core over an explicit (event_type, ts_t) frame — public for
    * the planted-spike scale spec.
    */
  def hourlyBursts(ev: DataFrame): DataFrame = {
    val hourly = ev
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts_t")).as("hour"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // moments + probe read the same (type, hour) pass
    // c·c stays BIGINT for bit-exact moments; the Σc² bound is
    // hours·c² < 2^63 ⇒ safe to ~3e9 events per (type, hour) — beyond
    // it DuckDB raises on overflow while Spark wraps (the q132 lesson),
    // so a deployment past that rate must switch these two sums to
    // DOUBLE and accept ulp-order variance
    val mom = hourly.groupBy(col("event_type"))
      .agg(sum(col("c")).as("sc"), sum(col("c") * col("c")).as("sc2"),
        count(lit(1)).as("nh"))
    hourly.join(broadcast(mom), Seq("event_type"))
      .withColumn("mean", col("sc").cast("double") / col("nh"))
      .withColumn("var",
        col("sc2").cast("double") / col("nh") - col("mean") * col("mean"))
      .select(col("event_type"), col("hour"), col("c").as("n_events"),
        round(col("mean"), 6).as("hourly_mean"),
        round(when(col("var") > 0,
          (col("c") - col("mean")) / sqrt(col("var"))), 6).as("z"))
      .withColumn("is_burst",
        when(col("z") >= BurstZ, 1L).otherwise(0L))
      .orderBy(col("event_type"), col("hour"))
  }

  private val q141: Q = (s, d) => hourlyBursts(eventsMicros(s, d))

  private lazy val q141Sql = s"""
    WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                      CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1, 2),
    mom AS (SELECT event_type, sum(c) AS sc, sum(c * c) AS sc2,
              count(*) AS nh
            FROM hourly GROUP BY 1),
    z AS (SELECT h.event_type, h.hour, h.c AS n_events,
            CAST(sc AS DOUBLE) / nh AS mean,
            CAST(sc2 AS DOUBLE) / nh
              - (CAST(sc AS DOUBLE) / nh) * (CAST(sc AS DOUBLE) / nh)
              AS var
          FROM hourly h JOIN mom m ON m.event_type = h.event_type)
    SELECT event_type, hour, n_events,
           round(mean, 6) AS hourly_mean,
           round(CASE WHEN var > 0
             THEN (n_events - mean) / sqrt(var) END, 6) AS z,
           CAST(CASE WHEN var > 0
               AND round((n_events - mean) / sqrt(var), 6) >= $BurstZ
             THEN 1 ELSE 0 END AS BIGINT) AS is_burst
    FROM z ORDER BY event_type, hour"""

  val queries: Map[String, Q] = Map(
    "q139_ddsketch_shard_fold" -> q139,
    "q140_user_entropy" -> q140,
    "q141_hourly_bursts" -> q141)

  val oracleSql: Map[String, String] = Map(
    "q139_ddsketch_shard_fold" -> q139Sql,
    "q140_user_entropy" -> q140Sql,
    "q141_hourly_bursts" -> q141Sql)
}
