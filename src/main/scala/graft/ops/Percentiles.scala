package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT grouped percentiles over a low-cardinality numeric column,
  * computed from a value histogram instead of buffering every row.
  *
  * Spark's built-in `percentile` aggregate collects every value of a
  * group into one task's memory — at 100 TB a group holds billions of
  * rows and the aggregate OOMs. But token counts, document lengths and
  * similar pipeline metrics have BOUNDED value cardinality (thousands of
  * distinct values no matter the corpus size), so the right plan is:
  *
  *   1. groupBy (group, value) → count   — map-side combinable shuffle,
  *      output rows = distinct values per group, not corpus rows;
  *   2. running cumulative count per group over the value order — the
  *      window partition holds only the distinct values (bounded);
  *   3. for quantile p, rank h = p*(n-1): the bracketing values are the
  *      rows whose cumulative range covers floor(h) / ceil(h), and the
  *      result interpolates v_lo + (h - floor(h)) * (v_hi - v_lo) —
  *      the standard type-7 definition (percentile_cont).
  *
  * All arithmetic is plain IEEE double ops in a fixed order, so any SQL
  * engine reproduces results bit-for-bit from the same formula (no libm
  * calls, no engine-internal quantile implementation involved).
  */
object Percentiles {

  /** Adds one column per (name → p) computing the exact interpolated
    * p-quantile of `valueCol` per `groupCol`, plus `n_docs` (group row
    * count). `valueCol` must be numeric; values are interpolated as
    * doubles and rounded to 6 places.
    */
  def exactByHistogram(df: DataFrame, groupCol: String, valueCol: String,
                       ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"quantiles must lie in [0, 1], got ${ps.map(_._2).mkString(", ")}")
    val hist = df.groupBy(col(groupCol), col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = hist
      .withColumn("_cum", sum(col("_c")).over(wOrd))
      .withColumn("_n", sum(col("_c")).over(wAll))

    // rank h = p*(n-1); a histogram row covers ranks [_cum - _c, _cum)
    def bracket(p: Double, r: Column => Column): Column = {
      val h = lit(p) * (col("_n") - 1).cast("double")
      val cumBefore = col("_cum") - col("_c")
      min(when(cumBefore <= r(h) && r(h) < col("_cum"),
        col("_v").cast("double")))
    }
    val lo = (h: Column) => floor(h)
    val hi = (h: Column) => ceil(h)

    val aggs = ps.flatMap { case (name, p) =>
      Seq(bracket(p, lo).as(s"_lo_$name"), bracket(p, hi).as(s"_hi_$name"))
    }
    val agged = ranked.groupBy(col(groupCol))
      .agg(max(col("_n")).as("n_docs"), aggs: _*)

    ps.foldLeft(agged) { case (acc, (name, p)) =>
      val h = lit(p) * (col("n_docs") - 1).cast("double")
      acc.withColumn(name,
        round(col(s"_lo_$name")
          + (h - floor(h).cast("double")) * (col(s"_hi_$name") - col(s"_lo_$name")), 6))
    }.select(col(groupCol) +: col("n_docs") +: ps.map(p => col(p._1)): _*)
  }

  /** The DuckDB mirror of [[exactByHistogram]] over table rows
    * (group, v): same histogram, same ranks, same interpolation — one
    * generator so the engines cannot diverge. Yields CTEs `ph` and
    * `pq`; select from `pq` (columns: group, n_docs, names...).
    */
  def histogramSql(fromSql: String, groupCol: String,
                   ps: Seq[(String, Double)]): String = {
    def h(p: Double) = s"($p * CAST(n - 1 AS DOUBLE))"
    val brackets = ps.flatMap { case (name, p) =>
      Seq(
        s"""min(CASE WHEN cum - c <= floor(${h(p)}) AND floor(${h(p)}) < cum
             THEN CAST(v AS DOUBLE) END) AS lo_$name""",
        s"""min(CASE WHEN cum - c <= ceil(${h(p)}) AND ceil(${h(p)}) < cum
             THEN CAST(v AS DOUBLE) END) AS hi_$name""")
    }.mkString(",\n             ")
    s"""ph AS (
      SELECT $groupCol, v, c,
             sum(c) OVER (PARTITION BY $groupCol ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY $groupCol) AS n
      FROM (SELECT $groupCol, v, count(*) AS c FROM ($fromSql) GROUP BY 1, 2)),
    pq AS (
      SELECT $groupCol, CAST(max(n) AS BIGINT) AS n_docs,
             $brackets
      FROM ph GROUP BY $groupCol)"""
  }

  /** Select-list fragment interpolating the `pq` CTE's lo/hi brackets —
    * the final step of [[histogramSql]]'s mirror (identical formula to
    * [[exactByHistogram]]'s Column form).
    */
  def interpSelectSql(ps: Seq[(String, Double)]): String =
    ps.map { case (name, p) =>
      val hh = s"($p * CAST(n_docs - 1 AS DOUBLE))"
      s"round(lo_$name + ($hh - floor($hh)) * (hi_$name - lo_$name), 6) AS $name"
    }.mkString(",\n           ")
}
