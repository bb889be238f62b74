package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The deterministic Poisson-bootstrap machinery shared by the batch
  * CI queries (q154/q155/q158) and the streaming CI monitor: Poisson(1)
  * replica weights from a 52-bit md5 uniform against integer CDF
  * thresholds computed ONCE here and baked into every plan as literals
  * — libm exp never runs inside an engine, so weights (and the integer
  * replica means derived from them) are engine-exact everywhere.
  *
  * The single-aggregation form ([[replicaAggs]] + [[ciFromSorted]])
  * exists for STREAMING: Structured Streaming forbids chained
  * aggregations, so the B replica sums ride ONE aggregation as
  * conditional columns (constant state per group) and the CI reads out
  * scan-local from the sorted in-row means array.
  */
object PoissonBoot {

  val B = 32
  private val Pow52 = 4503599627370496.0 // 2^52

  /** Cumulative Poisson(1) thresholds scaled to the 52-bit hash space:
    * weight(u) = #{k : t_k <= u} for u in [0, 2^52).
    */
  lazy val thresholds: Seq[Long] = {
    val pmf = (0 to 6).scanLeft(math.exp(-1.0))((p, k) => p / (k + 1))
      .take(8)
    val cum = pmf.scanLeft(0.0)(_ + _).drop(1)
    cum.map(c => math.min((c * Pow52).toLong, Pow52.toLong - 1))
  }

  /** weight CASE chain over a BIGINT u52 reference — Spark dialect
    * (`L` literal suffix).
    */
  def weightSql(u: String): String =
    "(CASE " + thresholds.zipWithIndex.map { case (t, k) =>
      s"WHEN $u < ${t}L THEN $k"
    }.mkString(" ") + s" ELSE ${thresholds.length} END)"

  /** The same chain in the DuckDB dialect (bare integer literals). */
  def weightDuckSql(u: String): String =
    "(CASE " + thresholds.zipWithIndex.map { case (t, k) =>
      s"WHEN $u < $t THEN $k"
    }.mkString(" ") + s" ELSE ${thresholds.length} END)"

  /** The 52-bit uniform for (id, replica) as a Column (the Kmv.hash52
    * pattern; both engines agree bit-for-bit). One md5 digest carries
    * 128 bits = two independent 13-hex-char uniforms, so replicas 2k
    * and 2k+1 share the digest md5(id|k) and read disjoint slices —
    * HALF the md5 calls of one-digest-per-replica, which is the
    * dominant cost of the ×B explode.
    */
  def u52(id: Column, b: Column): Column =
    // b >> 1 / b & 1: INTEGER halving in both engines (a `/ 2` would be
    // double division — Spark casts truncate but DuckDB casts ROUND)
    conv(substring(md5(to_binary(
      concat(id.cast("string"), lit("|"),
        shiftright(b.cast("int"), 1).cast("string")),
      lit("utf-8"))), (pmod(b, lit(2)) * 13 + 1).cast("int"), lit(13)),
      16, 10).cast("long")

  /** The identical uniform in the DuckDB dialect — one generator for
    * every bootstrap oracle, in lockstep with [[u52]] by construction.
    */
  def u52DuckSql(id: String, b: String): String =
    s"""CAST(('0x' || substr(md5(CAST($id AS VARCHAR) || '|' ||
          CAST(($b >> 1) AS VARCHAR)),
          CAST(($b % 2) * 13 + 1 AS INTEGER), 13)) AS BIGINT)"""

  /** Per-replica conditional sums over an exploded (b, w, m) row set —
    * 2·B aggregate columns `sw_b`/`swq_b`, ONE aggregation (the
    * streaming-legal form), plus the plain count/sum for the point
    * estimate. `m` is the metric in exact integer micro-units.
    */
  def replicaAggs(b: Column, w: Column, m: Column): Seq[Column] =
    // point-estimate inputs from the b=0 slice (each row appears once
    // per replica, so the slice is exactly the unexploded input)
    Seq(sum(when(b === 0, 1L).otherwise(0L)).as("n_events"),
      sum(when(b === 0, m).otherwise(0L)).as("sm_point")) ++
      (0 until B).flatMap { i =>
        Seq(sum(when(b === i, w).otherwise(0L)).as(s"sw_$i"),
          sum(when(b === i, w * m).otherwise(0L)).as(s"swq_$i"))
      }

  /** The in-row CI readout over the 2·B sum columns: exact half-away
    * integer replica means, sorted in-row, type-1 2.5%/97.5% picks.
    * A replica whose total weight is zero (P = e^-n per group — real
    * for SMALL streaming windows, negligible for batch groups) has no
    * mean; the quantile indices are taken over the NON-NULL replica
    * set, and a group with zero live replicas reports null bounds.
    * The mean uses the abs-and-sign form (the q143 pattern): a bare
    * `(2s + n) div 2n` is half-away only for s >= 0 — integer division
    * truncates toward zero in both engines, so a NEGATIVE metric sum
    * (signed event values) would silently round half-TOWARD-zero and
    * break the stated contract. Returns (ci_lo_micro, ci_hi_micro).
    */
  def ciFromSorted: (Column, Column) = {
    val means = array((0 until B).map(i =>
      expr(s"CASE WHEN sw_$i > 0 " +
        s"THEN (CASE WHEN swq_$i < 0 THEN -1 ELSE 1 END) * " +
        s"((2 * abs(swq_$i) + sw_$i) div (2 * sw_$i)) END")): _*)
    val sorted = array_sort(filter(means, m => m.isNotNull))
    val nz = size(sorted).cast("long")
    def pick(p: Int) = when(nz > 0,
      element_at(sorted, ((nz * p + 999L) / 1000L).cast("int")))
    (pick(25), pick(975))
  }
}
