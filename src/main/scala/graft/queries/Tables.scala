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
  /** events.parquet stores `ts` as Parquet TIMESTAMP(NANOS), which Spark
    * only reads via the nanosAsLong legacy flag — `ts` arrives as LongType
    * epoch-nanos. [[eventsMicros]] adds `ts_us` (BIGINT epoch-micros) and a
    * proper `ts_t` TimestampType column for window/stream operators.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // the flag belongs in session setup (Verify/Bench set it at build
    // time); only mutate the conf as a fallback for ad-hoc sessions —
    // an unconditional set() per table access is a global side effect
    // (and invalidates cached plan state) on every query call.
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
  }

  def eventsMicros(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events(s, d)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
