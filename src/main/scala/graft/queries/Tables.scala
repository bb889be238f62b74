package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver testdata (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** events.parquet has shipped `ts` in two physical shapes across testdata
    * generations: Parquet TIMESTAMP(NANOS), which Spark only reads as
    * LongType epoch-nanos under the nanosAsLong legacy flag, and (current)
    * native TIMESTAMP(MICROS) without UTC adjustment, which Spark reads as
    * TIMESTAMP_NTZ. [[eventsMicros]] normalizes either shape to the engine
    * contract every event query builds on: `ts_us` (BIGINT epoch-micros)
    * and `ts_t` (TimestampType) for window/stream operators. Sessions run
    * with spark.sql.session.timeZone=UTC (Verify/Bench set it), so the
    * NTZ→LTZ cast reads the naive wall clock as UTC — the same convention
    * DuckDB's epoch_us applies to the naive column on the oracle side.
    */
  def events(s: SparkSession, d: String): DataFrame = t(s, d, "events")

  def eventsMicros(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = events(s, d)
    raw.schema("ts").dataType match {
      case LongType => // legacy epoch-nanos (nanosAsLong sessions)
        raw
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      case _ => // TIMESTAMP_NTZ or TIMESTAMP
        raw
          .withColumn("ts_t", col("ts").cast(TimestampType))
          .withColumn("ts_us", unix_micros(col("ts").cast(TimestampType)))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
