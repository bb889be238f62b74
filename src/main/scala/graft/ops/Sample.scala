package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable stratified sampling for training-data
  * curation (mixture weighting across languages/sources, reproducible
  * eval holdouts).
  *
  * A row's fate depends ONLY on its key: the first 4 hex chars of
  * md5(key) — 65536 equiprobable buckets — compared lexicographically
  * against the stratum's keep-threshold string. No RNG, no partition
  * state, so the sample is identical across engines, re-runs, task
  * retries, and repartitionings (`sample()`/`sampleBy()` are none of
  * these: their XORShift draw depends on partition layout). The filter
  * evaluates in the scan stage itself — zero shuffle at any corpus size
  * (parquet can't evaluate md5, so it is not a PushedFilters row-group
  * predicate, but nothing past the scan reads a dropped row).
  *
  * Keyed sampling also gives CONSISTENT sampling across tables: two
  * tables sampled on the same join key keep the same key set, so the
  * sampled join is unbiased (the classic correlated-sampling trick).
  */
object Sample {

  /** Bucket space: 4 hex chars. */
  val Buckets: Int = 65536

  /** 4-char keep-threshold for a rate: rows whose bucket string sorts
    * BELOW it are kept, so a rate keeps floor(rate*65536) buckets.
    * rate>=1 maps to "zzzz" ('z' > every hex char: keeps all rows);
    * rate<=0 maps to "0000" (nothing sorts below it: keeps none).
    */
  def hexThreshold(rate: Double): String = {
    val n = math.floor(rate * Buckets).toLong
    if (n >= Buckets) "zzzz"
    else if (n <= 0L) "0000"
    else f"$n%04x"
  }

  /** First 4 hex chars of md5 of the key's string form — the SQL mirror
    * is `substr(md5(CAST(key AS VARCHAR)), 1, 4)`.
    */
  def bucket(key: Column): Column =
    substring(md5(to_binary(key.cast("string"), lit("utf-8"))), 1, 4)

  /** Keep each row iff its bucket sorts below its stratum's threshold:
    * per-stratum `rates` with `defaultRate` for unlisted strata.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Map[String, Double],
                           defaultRate: Double): DataFrame = {
    // rates is a Map (unordered) — the when-chain must not depend on its
    // iteration order, so sort the entries; strata are disjoint, so the
    // chain order can't change results, only the plan's textual form
    val thresh = rates.toSeq.sortBy(_._1).foldLeft(
        lit(hexThreshold(defaultRate)): Column) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(rate)))
          .otherwise(acc)
    }
    df.filter(bucket(col(keyCol)) < thresh)
  }

  /** Single-rate keep predicate on a key column (the correlated-sampling
    * primitive: two tables filtered with the same key and rate keep the
    * same key set, so their sampled join is unbiased).
    */
  def keep(key: Column, rate: Double): Column =
    bucket(key) < lit(hexThreshold(rate))

  /** DuckDB mirror of [[keep]]. */
  def keepPredicateSql(keyCol: String, rate: Double): String =
    s"substr(md5(CAST($keyCol AS VARCHAR)), 1, 4) < '${hexThreshold(rate)}'"

  /** The DuckDB mirror of [[stratifiedHashSample]]'s predicate (shared
    * generator so Spark and the oracle can never disagree on
    * thresholds).
    */
  def stratifiedPredicateSql(keyCol: String, strataCol: String,
                             rates: Map[String, Double],
                             defaultRate: Double): String = {
    val whens = rates.toSeq.sortBy(_._1).map { case (stratum, rate) =>
      s"WHEN '$stratum' THEN '${hexThreshold(rate)}'"
    }.mkString(" ")
    s"substr(md5(CAST($keyCol AS VARCHAR)), 1, 4) < " +
      s"(CASE $strataCol $whens ELSE '${hexThreshold(defaultRate)}' END)"
  }

  /** Temperature-weighted multinomial source mixing (the T5 / Llama
    * data-mix rule with α = 1/2): stratum s gets a share of the target
    * proportional to n_s^α, so small sources are up-weighted relative
    * to their natural frequency and no single giant source dominates.
    * Per-row keep rate r_s = min(1, targetFrac·Σn · sqrt(n_s)/Σsqrt(n) /
    * n_s), applied with the same md5-bucket predicate as
    * [[stratifiedHashSample]] — deterministic, shuffle-free on the fact
    * side at any corpus size.
    *
    * DERIVED rates are where engine portability gets won or lost: α is
    * fixed at 1/2 because IEEE `sqrt` is correctly rounded everywhere
    * (`pow` is not — the repo's one cross-engine ulp divergence came
    * from libm pow), the cross-stratum Σsqrt(n) and the rate are rounded
    * to 6 dp so summation-order wobble (~1e-12) cannot move a bucket
    * threshold, and the threshold string is the same %04x formatting on
    * floor(rate·65536) in both engines ([[temperatureThresholdSql]]).
    *
    * Plan shape: one tiny map-side-combinable count per stratum, the
    * per-stratum threshold frame BROADCAST back, the keep predicate in
    * the scan stage — the fact table is scanned once and never shuffled.
    */
  def temperatureSample(df: DataFrame, keyCol: String, strataCol: String,
                        targetFrac: Double): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
    val tot = counts.agg(sum(col("_n")).as("_total"),
      round(sum(sqrt(col("_n"))), 6).as("_ssum"))
    val thresh = counts.crossJoin(broadcast(tot))
      .withColumn("_rate", least(lit(1.0), round(
        lit(targetFrac) * col("_total") * sqrt(col("_n")) /
          col("_ssum") / col("_n"), 6)))
      .withColumn("_b", floor(col("_rate") * lit(Buckets)))
      .select(col(strataCol),
        when(col("_b") >= Buckets, lit("zzzz"))
          .when(col("_b") <= 0L, lit("0000"))
          .otherwise(format_string("%04x", col("_b"))).as("_thresh"))
    df.join(broadcast(thresh), Seq(strataCol))
      .filter(bucket(col(keyCol)) < col("_thresh"))
      .drop("_thresh")
  }

  /** DuckDB mirror of [[temperatureSample]]'s per-stratum threshold,
    * as a SQL expression over columns `n` (stratum count), `total` and
    * `ssum` (the rounded Σsqrt(n)) — one generator shared with the
    * oracle so the two engines cannot disagree on a formula detail.
    */
  def temperatureThresholdSql(targetFrac: Double): String = {
    val b = s"floor(least(1.0, round($targetFrac * total * sqrt(n) " +
      "/ ssum / n, 6)) * 65536)"
    s"(CASE WHEN $b >= 65536 THEN 'zzzz' WHEN $b <= 0 THEN '0000' " +
      s"ELSE printf('%04x', CAST($b AS BIGINT)) END)"
  }
}
