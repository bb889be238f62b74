package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.DedupOps
object ProbeSigPairs {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val w = DedupOps.adaptiveSimhashWidth(n)
    val dist = DedupOps.adaptiveSimhashDist(w)
    val sig = DedupOps.withSimhash(docs, "text", "simhash", w).drop("text")
      .localCheckpoint()
    val distinct = sig.select("simhash").distinct().count()
    val sp = DedupOps.simhashSigPairs(sig, "simhash", dist, w).localCheckpoint()
    val spN = sp.count()
    val pairs = DedupOps.simhashDocPairs(sig, "doc_id", "simhash", sp).count()
    println(s"[probe] n=$n w=$w dist=$dist distinctSigs=$distinct sigPairRows=$spN docPairs=$pairs")
    spark.stop()
  }
}
