package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — the reference's single most load-bearing
  * non-native primitive (Polars `join_asof` with `by=` groups,
  * /root/reference/pyield/interpolador.py:451-468, futuro/di1.py:100-105).
  *
  * Spark has no native as-of join; this implements it as ONE shuffle:
  * union both sides tagged, hash-partition by the group key, sort within
  * partitions by (key, tag), and resolve the match with an ordered-window
  * `last`/`first` with `ignoreNulls`. No broadcast, no range-join explosion,
  * no driver collect — scales linearly with data size and works for any
  * group cardinality, which is why it survives a 100 TB input where a
  * naive `left join + filter + row_number` (self-join blowup) would not.
  */
object AsOf {

  /** As-of join against a BROADCAST-sized right side (a published series, a
    * calendar): zero shuffle — the sorted right table ships to executors
    * and each left row resolves its bracket by binary search. This is the
    * right tool when `by` would be empty: the windowed form would funnel
    * every row through one partition, while this stays embarrassingly
    * parallel at any left-side scale.
    *
    * Keys are compared on their underlying long encoding (epoch day for
    * dates, epoch micros for timestamps, the value itself for integers).
    */
  /** Hard cap on the collected right side of [[joinBroadcast]]: above this
    * the series is not "broadcast-sized" and the caller should use the
    * shuffle-based [[join]] instead of silently dragging a large table
    * through the driver.
    */
  val MaxBroadcastRows: Int = 2 << 20 // ~2M rows

  def joinBroadcast(left: DataFrame, right: DataFrame,
                    leftOn: String, rightOn: String,
                    payload: Seq[(String, String)],
                    forward: Boolean = false,
                    maxRows: Int = MaxBroadcastRows): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = left.sparkSession

    val keyType = right.schema(rightOn).dataType
    def keyExpr(c: Column) = keyType match {
      case DateType => unix_date(c.cast("date")).cast("long")
      case TimestampType | TimestampNTZType => unix_micros(c)
      case _ => c.cast("long")
    }

    // limit(maxRows + 1) bounds what can ever reach the driver; one extra
    // row distinguishes "right at the cap" from "over it".
    val rows = right.select((keyExpr(col(rightOn)) +:
        payload.map { case (rc, _) => col(rc) }): _*)
      .filter(col(rightOn).isNotNull)
      .limit(maxRows + 1)
      .collect()
      .sortBy(_.getLong(0))
    require(rows.length <= maxRows,
      s"AsOf.joinBroadcast right side exceeds $maxRows rows — it is not " +
        "broadcast-sized; use AsOf.join (single-shuffle windowed form) instead")
    val keys = rows.map(_.getLong(0))
    val bcKeys = spark.sparkContext.broadcast(keys)

    // resolve the matched row index with a binary-search UDF; the payload
    // then arrives through ONE broadcast hash join on that index — no
    // per-column lookup UDFs, and every payload type is handled natively
    val fwd = forward
    val idxUdf = udf((k: java.lang.Long) => {
      if (k == null) -1
      else {
        val ks = bcKeys.value
        var i = java.util.Arrays.binarySearch(ks, k.longValue())
        if (i >= 0) {
          // ties: backward wants the last equal, forward the first equal
          if (fwd) { while (i > 0 && ks(i - 1) == k) i -= 1 }
          else { while (i < ks.length - 1 && ks(i + 1) == k) i += 1 }
          i
        } else {
          val ins = -(i + 1)
          if (fwd) (if (ins < ks.length) ins else -1)
          else ins - 1
        }
      }
    })

    val lookupSchema = StructType(
      StructField("_asof_ridx", IntegerType, nullable = false) +:
        payload.map { case (rc, outName) =>
          right.schema(rc).copy(name = outName) })
    val lookupRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(rows.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(
          i +: payload.indices.map(j => r.get(j + 1)))
      }: _*)
    val lookup = spark.createDataFrame(lookupRows, lookupSchema)

    left.withColumn("_asof_idx", idxUdf(keyExpr(col(leftOn))))
      .join(broadcast(lookup), col("_asof_idx") === col("_asof_ridx"), "left")
      .drop("_asof_idx", "_asof_ridx")
  }

  /** Attach to each `left` row the payload of the matching `right` row.
    *
    * @param by        equality group columns (present in both sides)
    * @param leftOn    ordering key column in `left`
    * @param rightOn   ordering key column in `right`
    * @param payload   columns of `right` to carry over (must not collide
    *                  with `left` column names; rename beforehand if needed).
    *                  `rightOn` itself may be included (renamed) to expose
    *                  the matched key.
    * @param forward   false → backward: last right row with key <= left key;
    *                  true  → forward: first right row with key >= left key.
    */
  def join(left: DataFrame, right: DataFrame, by: Seq[String],
           leftOn: String, rightOn: String,
           payload: Seq[(String, String)], // (rightCol, outName)
           forward: Boolean = false): DataFrame = {

    val keyCol = "_asof_key"
    val tagCol = "_asof_tag" // 0 = right (curve), 1 = left (target)

    val leftCols = left.columns.toSeq
    val outNames = payload.map(_._2)

    val l = left
      .withColumn(keyCol, col(leftOn))
      .withColumn(tagCol, lit(1))
      .select((Seq(col(keyCol), col(tagCol)) ++
        by.map(col) ++
        leftCols.filterNot(by.contains).map(col) ++
        outNames.map(n => lit(null).as(n + "_r"))): _*)

    val r = right
      .withColumn(keyCol, col(rightOn))
      .withColumn(tagCol, lit(0))
      .select((Seq(col(keyCol), col(tagCol)) ++
        by.map(col) ++
        leftCols.filterNot(by.contains).map(n => lit(null).as(n)) ++
        payload.map { case (rc, on) => col(rc).as(on + "_r") }): _*)

    val unioned = l.unionByName(r)

    // Backward: right rows sort BEFORE left rows at equal key (tag asc) so an
    // exact-key match is inside the (-inf, 0] frame. Forward: right rows sort
    // AFTER left rows (tag desc) so the exact match is inside [0, +inf).
    // Both directions use the RUNNING frame (unboundedPreceding, currentRow),
    // which Spark evaluates in O(n) streaming fashion; the forward variant
    // simply reverses the sort. An (currentRow, unboundedFollowing) frame
    // with first(ignoreNulls) degrades to O(n^2) per partition — measured
    // 100x slower at sf0.1 — so it is deliberately avoided.
    val w =
      if (forward)
        Window.partitionBy(by.map(col): _*)
          .orderBy(col(keyCol).desc_nulls_last, col(tagCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        Window.partitionBy(by.map(col): _*)
          .orderBy(col(keyCol).asc_nulls_last, col(tagCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Resolve the matched right ROW as one struct, not each payload column
    // separately: per-column last(ignoreNulls) would skip a matched row
    // whose payload value is genuinely null (reaching back to an older
    // row) and could even stitch together values from different right
    // rows. The struct is non-null for every right row (even when all its
    // fields are null), so ignoreNulls skips exactly the left rows.
    //
    // Null ordering keys must resolve to null payloads (Polars join_asof
    // null propagation): *_nulls_last would otherwise hand a null-key left
    // row the payload of the extreme-key right row via the running window.
    val payloadStruct = "_asof_payload"
    val resolved = unioned
      .withColumn(payloadStruct,
        when(col(tagCol) === 0, struct(outNames.map(n => col(n + "_r")): _*)))
      .withColumn(payloadStruct,
        when(col(keyCol).isNull, lit(null))
          .otherwise(last(col(payloadStruct), ignoreNulls = true).over(w)))

    outNames.foldLeft(resolved) { (df, n) =>
        df.withColumn(n, col(s"$payloadStruct.${n}_r"))
      }
      .filter(col(tagCol) === 1)
      .select((by.map(col) ++ leftCols.filterNot(by.contains).map(col) ++
        outNames.map(col)): _*)
  }
}
