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
    * @param spreadDuplicates mix `spark_partition_id()` into the salt so
    *   EXACT duplicate rows of a hot key spread across buckets too (a
    *   content-only salt collapses them into one bucket, regressing the
    *   skew spread on duplicate-dominated inputs). Still deterministic
    *   under task retry — a recomputed map task keeps its partition id
    *   and row content, so every row re-lands in the same bucket. Off by
    *   default: with it on, bucket assignment depends on the input's
    *   partitioning, which is fine for aggregation but worth opting into
    *   consciously.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                aggs: Seq[(String, String, String)],
                saltBuckets: Int = 16,
                spreadDuplicates: Boolean = false): DataFrame = {
    // salt DETERMINISTICALLY from the full row content: a nondeterministic
    // salt (rand / monotonically_increasing_id) re-buckets rows when a map
    // task is recomputed after a fetch failure, double-counting or
    // dropping them in the partial aggregate. Identical duplicate rows
    // land in one bucket (unless spreadDuplicates), which is correct and
    // still spreads a hot KEY, the case salting exists for.
    val saltInputs =
      df.columns.map(col) ++ (if (spreadDuplicates) Seq(spark_partition_id()) else Nil)
    val salted = df.withColumn("_salt",
      pmod(hash(saltInputs: _*), lit(saltBuckets)))

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
