package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-area query providers; every entry has (or
  * deliberately omits, for non-SQL-expressible ops) a DuckDB oracle in
  * `oracleSql` with IDENTICAL output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the vectorized multi-curve flat-forward interpolation pipeline
    * (union + single-shuffle windowed as-of + expression cascade).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q22_interpolate_multicurve")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Relational2.queries ++
      graft.queries.Domain.queries ++
      graft.queries.Pipeline.queries ++
      graft.queries.BondQueries.queries ++
      graft.queries.Pipeline2.queries ++
      graft.queries.Pipeline3.queries ++
      graft.queries.Pipeline4.queries ++
      graft.queries.Pipeline5.queries ++
      graft.queries.Pipeline6.queries ++
      graft.queries.Pipeline7.queries ++
      graft.queries.Pipeline8.queries ++
      graft.queries.Pipeline9.queries ++
      graft.queries.Pipeline10.queries ++
      graft.queries.Pipeline11.queries ++
      graft.queries.Pipeline12.queries ++
      graft.queries.Pipeline13.queries ++
      graft.queries.Pipeline14.queries ++
      graft.queries.Pipeline15.queries ++
      graft.queries.Pipeline16.queries ++
      graft.queries.Pipeline17.queries ++
      graft.queries.Pipeline18.queries ++
      graft.queries.Pipeline19.queries ++
      graft.queries.Pipeline20.queries ++
      graft.queries.Pipeline21.queries ++
      graft.queries.Pipeline22.queries ++
      graft.queries.Pipeline23.queries ++
      graft.queries.Pipeline24.queries ++
      graft.queries.Pipeline25.queries ++
      graft.queries.Pipeline26.queries ++
      graft.queries.Pipeline27.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.Relational2.oracleSql ++
      graft.queries.Domain.oracleSql ++
      graft.queries.Pipeline.oracleSql ++
      graft.queries.BondQueries.oracleSql ++
      graft.queries.Pipeline2.oracleSql ++
      graft.queries.Pipeline3.oracleSql ++
      graft.queries.Pipeline4.oracleSql ++
      graft.queries.Pipeline5.oracleSql ++
      graft.queries.Pipeline6.oracleSql ++
      graft.queries.Pipeline7.oracleSql ++
      graft.queries.Pipeline8.oracleSql ++
      graft.queries.Pipeline9.oracleSql ++
      graft.queries.Pipeline10.oracleSql ++
      graft.queries.Pipeline11.oracleSql ++
      graft.queries.Pipeline12.oracleSql ++
      graft.queries.Pipeline13.oracleSql ++
      graft.queries.Pipeline14.oracleSql ++
      graft.queries.Pipeline15.oracleSql ++
      graft.queries.Pipeline16.oracleSql ++
      graft.queries.Pipeline17.oracleSql ++
      graft.queries.Pipeline18.oracleSql ++
      graft.queries.Pipeline19.oracleSql ++
      graft.queries.Pipeline20.oracleSql ++
      graft.queries.Pipeline21.oracleSql ++
      graft.queries.Pipeline22.oracleSql ++
      graft.queries.Pipeline23.oracleSql ++
      graft.queries.Pipeline24.oracleSql ++
      graft.queries.Pipeline25.oracleSql ++
      graft.queries.Pipeline26.oracleSql ++
      graft.queries.Pipeline27.oracleSql
}
