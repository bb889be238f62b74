package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dedup. The reference's `unique(subset, keep="last"/"first")`
  * (/root/reference/pyield/interpolador.py:68,431, bc/sgs.py:124) relies on
  * Polars' stable row order; Spark has no stable order, so determinism needs
  * an explicit ordering column — `dropDuplicates` alone keeps an arbitrary
  * row. One shuffle on the key columns.
  */
object Dedup {

  private val rn = "_dedup_rn"

  /** Keep, per key group, the row with the greatest `ord`. */
  def keepLast(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.map(_.desc): _*)
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }

  /** Keep, per key group, the row with the smallest `ord`. */
  def keepFirst(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.map(_.asc): _*)
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }
}
