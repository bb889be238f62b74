package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnoses q81's 10× scaling: candidate/gated pair counts and the
  * similarity histogram of the gated set at sf0.1 vs the Scale10
  * inflation — says whether the superlinear wall clock is pair GROWTH
  * (a blocking flaw) or per-pair cost (the broadcast fallback + DP).
  */
object ProbeQ81Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- Seq("/root/testdata/sf0.1", "target/scale10/data")) {
      graft.tools.BenchStore.clearMemos()
      val sp = graft.queries.ClusterMemo.scoredPairs(spark, d)
      val n = sp.count()
      val gated = sp.filter(col("est_jaccard") >= 0.25)
      val ng = gated.count()
      println(s"[probe] $d candidates=$n gated(est>=0.25)=$ng")
      sp.groupBy(floor(col("jaccard") * 4).as("jband"))
        .agg(count(lit(1)).as("n")).orderBy(col("jband"))
        .collect().foreach(r => println(s"[probe]   exactJ band ${r.get(0)}: ${r.get(1)}"))
      gated.groupBy(floor(col("est_jaccard") * 4).as("qband"))
        .agg(count(lit(1)).as("n")).orderBy(col("qband"))
        .collect().foreach(r => println(s"[probe]   est band ${r.get(0)}: ${r.get(1)}"))
      val docs = spark.read.parquet(s"$d/documents.parquet")
      println(s"[probe] docs=${docs.count()}")
    }
    spark.stop()
  }
}
