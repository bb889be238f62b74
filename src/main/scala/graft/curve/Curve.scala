package graft.curve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curve operators: forward rates and flat-forward interpolation.
  *
  * Formulas and contracts mirror the reference:
  *   - forwards: /root/reference/pyield/fwd.py:9-200
  *       fwd_k = (f_k^au_k / f_j^au_j)^(1/(au_k-au_j)) - 1, f = 1+tx,
  *       au = du/252; first row of each group (min du) is the spot rate;
  *       duplicate (group, du) vertices are invalidated with null and the
  *       null cascades one row downstream via the lag.
  *   - interpolation: /root/reference/pyield/interpolador.py:306-497
  *       flat-forward between bracketing vertices j (last <= du) and
  *       k (first >= du), exact-vertex passthrough, short end -> first rate,
  *       long end -> null unless extrapolate.
  */
object Curve {

  /** Forward rates as a composable window Column (the analogue of
    * `forwards_expr`). Window-only: no join, no extra shuffle beyond the
    * (group) hash partitioning Spark needs anyway.
    */
  def forwards(du: Column, tx: Column, group: Column): Column = {
    val wDup = Window.partitionBy(group, du)
    // Ambiguous duplicated vertices are nulled; the null then cascades to
    // the next vertex through the lag, exactly like the reference contract.
    val txK = when(count(lit(1)).over(wDup) > 1, lit(null).cast("double"))
      .otherwise(tx)

    val wOrd = Window.partitionBy(group).orderBy(du.asc_nulls_last)
    val auK = du.cast("double") / lit(252)
    val txJ = lag(txK, 1).over(wOrd)
    val auJ = lag(auK, 1).over(wOrd)

    val fwd = pow((pow(txK + 1, auK) / pow(txJ + 1, auJ)),
      lit(1.0) / (auK - auJ)) - 1

    val wAll = Window.partitionBy(group)
    val isFirst = du === min(du).over(wAll)
    when(isFirst, txK).otherwise(fwd)
  }

  /** Vectorized multi-curve flat-forward interpolation (the reference's
    * flagship relational pipeline, EP3).
    *
    * Scale design: a SINGLE shuffle on the group key. Targets and curve
    * vertices are unioned and tagged; bracketing vertices j/k come from two
    * ordered-window passes over the same partitioning (backward `last` /
    * forward `first` with ignoreNulls), and the per-group extremes from
    * whole-partition windows — no join at all, so there is no broadcast
    * limit on curve size and no skew amplification.
    *
    * @param targets  DataFrame of target rows (kept intact in the output)
    * @param targetDu target business-day column in `targets`
    * @param curve    DataFrame with group + du + tx columns
    * @param groupT   group columns in targets (may be empty: single curve)
    * @param groupC   matching group columns in curve (same length)
    * @param outCol   name of the interpolated-rate output column
    */
  def interpolate(targets: DataFrame, targetDu: String,
                  curve: DataFrame, curveDu: String, curveTx: String,
                  groupT: Seq[String] = Seq.empty,
                  groupC: Seq[String] = Seq.empty,
                  extrapolate: Boolean = false,
                  outCol: String = "taxa_interpolada"): DataFrame = {
    require(groupT.length == groupC.length)

    val g = groupT.indices.map(i => s"_grp$i")
    val tagCol = "_itag"
    val keyCol = "_ikey"

    val tCols = targets.columns.toSeq
    // working columns would silently overwrite identically-named caller
    // columns; fail fast instead
    val reserved = (Seq(tagCol, keyCol, "_cdu", "_ctx", "_arr", "_du_j",
      "_tx_j", "_du_k", "_tx_k", "_du_min", "_du_max", "_tx_min",
      "_tx_max") ++ g).toSet
    val clash = tCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"targets contain reserved interpolate working columns: $clash")

    val t = groupT.zip(g).foldLeft(targets) { case (df, (src, dst)) =>
      df.withColumn(dst, col(src))
    }
      .withColumn(keyCol, col(targetDu).cast("long"))
      .withColumn(tagCol, lit(1))
      .withColumn("_cdu", lit(null).cast("long"))
      .withColumn("_ctx", lit(null).cast("double"))

    // Curve prep: cast, drop null/NaN vertices (reference drops both).
    val c0 = groupC.zip(g).foldLeft(curve) { case (df, (src, dst)) =>
      df.withColumn(dst, col(src))
    }
      .select((g.map(col) :+
        col(curveDu).cast("long").as("_cdu") :+
        col(curveTx).cast("double").as("_ctx")): _*)
      .filter(col("_cdu").isNotNull && col("_ctx").isNotNull &&
        !isnan(col("_ctx")))
      // duplicate (group, du) vertices keep the LAST arrival (reference
      // interpolador.py:431 unique(keep="last")); without this the two
      // window passes could each pick a different duplicate
      .withColumn("_arr", monotonically_increasing_id())
      .withColumn("_rn", row_number().over(
        Window.partitionBy((g :+ "_cdu").map(col): _*)
          .orderBy(col("_arr").desc)))
      .filter(col("_rn") === 1)
      .drop("_arr", "_rn")

    val c = c0
      .withColumn(keyCol, col("_cdu"))
      .withColumn(tagCol, lit(0))
    // Re-expose the group columns under the targets' names, then null-fill
    // the remaining target columns so both sides union by name.
    val cNamed = groupT.zip(g).foldLeft(c) { case (df, (tname, gname)) =>
      df.withColumn(tname, col(gname))
    }
    val cAligned = tCols.filterNot(groupT.contains)
      .foldLeft(cNamed)((df, n) => df.withColumn(n, lit(null)))
      .select(t.columns.map(col): _*)

    val u = t.unionByName(cAligned)

    // Both as-of passes use RUNNING frames (O(n) streaming evaluation);
    // the forward bracket comes from a descending sort rather than an
    // (currentRow, unboundedFollowing) frame, which is O(n^2) per
    // partition in Spark's window exec for ignoreNulls first().
    val part = Window.partitionBy(g.map(col): _*)
    val wBack = part.orderBy(col(keyCol).asc_nulls_last, col(tagCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = part.orderBy(col(keyCol).desc_nulls_last, col(tagCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = part.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wAllOrd = part.orderBy(col(keyCol).asc_nulls_last, col(tagCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    val enriched = u
      .withColumn("_du_j", last(col("_cdu"), ignoreNulls = true).over(wBack))
      .withColumn("_tx_j", last(col("_ctx"), ignoreNulls = true).over(wBack))
      .withColumn("_du_k", last(col("_cdu"), ignoreNulls = true).over(wFwd))
      .withColumn("_tx_k", last(col("_ctx"), ignoreNulls = true).over(wFwd))
      .withColumn("_du_min", min(col("_cdu")).over(wAll))
      .withColumn("_du_max", max(col("_cdu")).over(wAll))
      .withColumn("_tx_min", first(col("_ctx"), ignoreNulls = true).over(wAllOrd))
      .withColumn("_tx_max", last(col("_ctx"), ignoreNulls = true).over(wAllOrd))

    val du = col(keyCol).cast("double")
    val au = du / 252
    val auJ = col("_du_j").cast("double") / 252
    val auK = col("_du_k").cast("double") / 252
    val faJ = pow(col("_tx_j") + 1, auJ)
    val faK = pow(col("_tx_k") + 1, auK)
    val ft = (au - auJ) / (auK - auJ)
    val mid = pow(faJ * pow(faK / faJ, ft), lit(1.0) / au) - 1

    val nullD = lit(null).cast("double")
    val taxa =
      when(col(keyCol).isNull || col("_du_min").isNull, nullD)
        .when(col("_du_j") === col(keyCol), col("_tx_j"))
        .when(col(keyCol) < col("_du_min"), col("_tx_min"))
        .when(col(keyCol) > col("_du_max"),
          if (extrapolate) col("_tx_max") else nullD)
        .otherwise(mid)

    // fill_nan(None) (reference interpolador.py:500): NaN produced by the
    // flat-forward arithmetic (e.g. a -100% vertex) surfaces as null
    val taxaFilled = when(isnan(taxa), lit(null).cast("double"))
      .otherwise(taxa)

    enriched
      .filter(col(tagCol) === 1)
      .withColumn(outCol, taxaFilled)
      .select((tCols :+ outCol).map(col): _*)
  }
}
