package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-interval (range) join: pair every `right` row with the `left`
  * rows of the same key whose timestamp opens a window containing it —
  * r.ts in [l.ts, l.ts + window). The event-attribution / impression↔
  * conversion shape, between the as-of join (nearest single match,
  * [[AsOf]]) and a full range join.
  *
  * Scale shape: the naive plan — equi-join on the key, range predicate
  * as a post-join filter — builds per-key cross products, quadratic in
  * per-key event count (a power user with 10^5 events contributes
  * 10^10 candidate pairs at 100 TB). Instead both sides are bucketed by
  * floor(epoch / window): a right row at bucket b can only match left
  * rows in buckets {b, b-1}, so the right side explodes those two
  * bucket ids and the join is an EQUI-join on (key, bucket) — candidate
  * work per (key, bucket) cell is |L_cell| × |R_cell|, bounded by the
  * window, not by a key's total history; the exact range predicate
  * filters the cell. One shuffle per side, no nested loops (plan-gated).
  *
  * Watermarked stream-stream joins use the canonical range-condition
  * form instead ([[graft.streaming.EventStreams.attributionPairs]]) —
  * Spark's state eviction needs the raw time bound; this bucketed form
  * is the batch/backfill twin.
  */
object IntervalJoin {

  /** Inner bounded-interval join. Column names of `left` and `right`
    * must be disjoint apart from `keyCol`; both timestamp columns keep
    * their names in the output (`_bkt` is internal and dropped).
    */
  def bucketed(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String, windowSec: Long): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val lb = left.withColumn("_bkt",
      floor(unix_timestamp(col(leftTs)) / windowSec))
    val rb = right.withColumn("_b",
        floor(unix_timestamp(col(rightTs)) / windowSec))
      .withColumn("_bkt", explode(array(col("_b"), col("_b") - 1)))
      .drop("_b")
    lb.join(rb, Seq(keyCol, "_bkt"))
      .filter(col(leftTs) <= col(rightTs) &&
        col(rightTs) < col(leftTs) + expr(s"INTERVAL $windowSec SECONDS"))
      .drop("_bkt")
  }
}
