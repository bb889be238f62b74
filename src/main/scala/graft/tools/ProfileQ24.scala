package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bonds.BondColumns
import graft.functions._

/** Scratch profiling main for the q24 STN pricing stages. */
object ProfileQ24 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(label: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val base = spark.read.parquet(s"$d/orders.parquet")
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("liq"))
      .withColumn("venc",
        add_months(trunc(col("liq"), "mon"), ((col("o_orderkey") % 40 + 2) * 6).cast("int")))
      .withColumn("taxa", (col("o_orderkey") % 100).cast("double") / 1000 + lit(0.03))

    run("base only")(base)
    run("ltn_pu")(base.withColumn("x", BondColumns.ltn_pu(col("liq"), col("venc"), col("taxa"))))
    run("ntnb_cot")(base.withColumn("x", BondColumns.ntnb_cotacao(col("liq"), col("venc"), col("taxa"))))
    run("ntnb_cot 2nd")(base.withColumn("x", BondColumns.ntnb_cotacao(col("liq"), col("venc"), col("taxa"))))
    run("ntnb_dur")(base.withColumn("x", BondColumns.ntnb_duration(col("liq"), col("venc"), col("taxa"))))
    val withCot = base.withColumn("cot", BondColumns.ntnb_cotacao(col("liq"), col("venc"), col("taxa")))
      .withColumn("pu", BondColumns.ntnb_pu(lit(4000.0), col("cot")))
    run("ntnb_dv01")(withCot.withColumn("x",
      BondColumns.ntnb_dv01(col("liq"), col("venc"), col("taxa"), col("pu"))))
    run("lft_cot")(base.withColumn("x", BondColumns.lft_cotacao(col("liq"), col("venc"), col("taxa") / 100)))
    run("full q24")(graft.SparkEntry.queries("q24_stn_pricing")(spark, d))
    run("full q24 no sort")(graft.SparkEntry.queries("q24_stn_pricing")(spark, d)
      .sortWithinPartitions(col("o_orderkey")))
    spark.stop()
  }
}
