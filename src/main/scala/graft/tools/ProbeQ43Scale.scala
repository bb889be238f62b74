package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnoses q43's 10× scaling (worst SCALE10 exponent, 0.86): pair
  * output, distinct-signature saturation and bucket density at sf0.1 vs
  * the Scale10 inflation — says whether the near-linear wall clock is
  * intrinsic output growth (the 16-bit signature space saturating, a
  * property of the oracle-pinned sketch width) or a plan flaw.
  */
object ProbeQ43Scale {
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
      BenchStore.clearMemos()
      val docs = graft.queries.Tables.documents(spark, d).count()
      for (w <- Seq(16, 32)) {
        val sig = graft.dedup.DedupOps.withSimhash(
          graft.queries.Tables.documents(spark, d)
            .select(col("doc_id"), col("text")),
          "text", "simhash", w).drop("text").localCheckpoint()
        val nSig = sig.select("simhash").distinct().count()
        val t0 = System.nanoTime()
        val pairs = graft.dedup.DedupOps.simhashHammingPairs(
          sig, "doc_id", "simhash", maxDist = 2, width = w).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val maxBucket = sig.groupBy("simhash").count()
          .agg(max("count")).collect()(0).getLong(0)
        println(f"[probe] $d docs=$docs width=$w distinctSigs=$nSig " +
          f"maxBucket=$maxBucket pairs=$pairs ballSec=$sec%.2f")
      }
    }
    spark.stop()
  }
}
