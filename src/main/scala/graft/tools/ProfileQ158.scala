package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q158: where do the seconds go in the ×32 replica
  * explode — the md5, the conv() hex parse, or the aggregation?
  */
object ProfileQ158 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[q158] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val base = graft.queries.Tables.eventsMicros(spark, d)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 1e6, 0).cast("long").as("vm"))
      .localCheckpoint()
    val rep0 = base.select(col("event_type"), col("event_id"), col("vm"),
      explode(sequence(lit(0), lit(31))).as("b"))
    time("explode only") { rep0.count() }
    time("explode+md5") {
      rep0.select(md5(to_binary(concat(col("event_id").cast("string"),
        lit("|"), col("b")), lit("utf-8"))).as("h")).count()
    }
    val u = graft.ops.PoissonBoot.u52(col("event_id"), col("b"))
    time("explode+u52 (md5+conv)") { rep0.select(u.as("u")).count() }
    val w = expr(graft.ops.PoissonBoot.weightSql("u")).cast("long")
    time("explode+u52+weight") {
      rep0.withColumn("u", u).select(w.as("w")).count()
    }
    time("full agg") {
      rep0.withColumn("u", u).withColumn("w", w)
        .groupBy(col("event_type"), col("b"))
        .agg(sum(col("w")), sum(col("w") * col("vm"))).count()
    }
    time("full agg again") {
      rep0.withColumn("u", u).withColumn("w", w)
        .groupBy(col("event_type"), col("b"))
        .agg(sum(col("w")), sum(col("w") * col("vm"))).count()
    }
    time("whole q158 (noop write)") {
      graft.SparkEntry.queries("q158_value_ci")(spark, d)
        .write.format("noop").mode("overwrite").save(); 1L
    }
    time("whole q158 again") {
      graft.SparkEntry.queries("q158_value_ci")(spark, d)
        .write.format("noop").mode("overwrite").save(); 1L
    }
    spark.stop()
  }
}
