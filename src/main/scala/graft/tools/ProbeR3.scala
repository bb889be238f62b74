package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.DedupOps
object ProbeR3 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val w = DedupOps.adaptiveSimhashWidth(n)
    val sig = DedupOps.withSimhash(docs, "text", "sh", w).select("doc_id","sh")
    val distinct = sig.select("sh").distinct().count()
    for (r <- Seq(2, 3)) {
      val t0 = System.nanoTime()
      val c = DedupOps.simhashHammingPairs(sig, "doc_id", "sh", r, w).count()
      println(s"[probe] n=$n w=$w distinctSigs=$distinct radius=$r pairs=$c t=${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
