package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A groupBy on a skewed key funnels the hot key's rows into one reducer.
  * Salting splits each key into `saltBuckets` sub-keys for a partial
  * aggregate, then combines partials in a second (tiny) aggregation —
  * the hot key's work spreads across `saltBuckets` tasks. Results are
  * identical to the plain groupBy for any algebraic aggregate.
  *
  * (AQE's skew-join handling covers joins; this is the aggregation-side
  * counterpart for when a single group dominates at 100 TB.)
  */
object Salt {

  /** sum/count aggregates over possibly-skewed keys.
    *
    * @param aggs (valueColumn, "sum"|"count", outName)
    */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                aggs: Seq[(String, String, String)],
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(keys.head), monotonically_increasing_id()),
        lit(saltBuckets)))

    val partialExprs = aggs.map {
      case (c, "sum", out)   => sum(col(c)).as(s"_p_$out")
      case (c, "count", out) => count(col(c)).as(s"_p_$out")
      case (_, other, _) =>
        throw new IllegalArgumentException(s"unsupported agg: $other")
    }
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)

    val finalExprs = aggs.map { case (_, _, out) =>
      sum(col(s"_p_$out")).as(out)
    }
    partial.groupBy(keys.map(col): _*)
      .agg(finalExprs.head, finalExprs.tail: _*)
  }
}
