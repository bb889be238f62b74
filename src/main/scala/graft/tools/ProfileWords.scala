package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-timing of the GramMemo words-table build. */
object ProfileWords {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[w] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    time("scan+repartition only") {
      docs.repartition(32).write.format("noop").mode("overwrite").save()
    }
    val w = docs.repartition(32)
      .select(col("doc_id"),
        split(graft.text.TextOps.normalize(col("text")), " ").as("words"))
    time("words noop (no checkpoint)") {
      w.write.format("noop").mode("overwrite").save()
    }
    time("words noop again") {
      w.write.format("noop").mode("overwrite").save()
    }
    time("words localCheckpoint") { w.localCheckpoint() }
    time("words localCheckpoint again") { w.localCheckpoint() }
    val w2 = docs.repartition(32)
      .select(col("doc_id"),
        split(graft.text.TextOps.normalize(col("text")), " ").as("words"),
        col("text"))
    time("words+text localCheckpoint") { w2.localCheckpoint() }
    spark.stop()
  }
}
