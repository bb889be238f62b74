package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.DedupOps

/** Scratch profiling main for the q43 simhash-pair pipeline. */
object ProfileQ43 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sig = DedupOps.withSimhash16(docs, "text", "simhash").drop("text")

    time("sig only")(run(sig))
    val sigC = sig.cache()
    println("[prof] rows=" + sigC.count())
    println("[prof] distinct sigs=" + sigC.select("simhash").distinct().count())
    val pairs = DedupOps.simhashHammingPairs(sigC, "doc_id", "simhash", 2)
    println("[prof] output pairs=" + time("count pairs")(pairs.count()))
    time("pairs noop")(run(pairs))
    time("pairs + orderBy")(run(pairs.orderBy(col("id_a"), col("id_b"))))
    sigC.unpersist()

    // uncached form exactly as q43 runs it
    val q43 = DedupOps.simhashHammingPairs(
      DedupOps.withSimhash16(docs, "text", "simhash").drop("text"),
      "doc_id", "simhash", 2).orderBy(col("id_a"), col("id_b"))
    time("full q43 (as benched)")(run(q43))
    time("full q43 again")(run(q43))
    spark.stop()
  }
}
