package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.DedupOps
object ProbeQ43x30 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[p30] $label: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
  }
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("target/scale30/data")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = t("count docs")(docs.count())
    val w = DedupOps.adaptiveSimhashWidth(n)
    val dist = DedupOps.adaptiveSimhashDist(w)
    System.err.println(s"[p30] n=$n w=$w dist=$dist")
    val sigs = t("sig build+pin")(
      DedupOps.withSimhash(docs, "text", "simhash", w).drop("text")
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    val ds = t("distinct sigs")(sigs.select("simhash").distinct().count())
    System.err.println(s"[p30] distinctSigs=$ds")
    val sp = t("sigPairs build+pin")(
      DedupOps.simhashSigPairs(sigs, "simhash", dist, w)
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    val spN = t("sigPairs count")(sp.count())
    System.err.println(s"[p30] sigPairRows=$spN")
    val dp = DedupOps.simhashDocPairs(sigs, "doc_id", "simhash", sp)
    val dpN = t("docPairs noop")(
      dp.write.format("noop").mode("overwrite").save())
    val c = t("docPairs count")(dp.count())
    System.err.println(s"[p30] docPairs=$c")
    spark.stop()
  }
}
