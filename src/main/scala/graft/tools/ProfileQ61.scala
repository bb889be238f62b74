package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-clock of the q61 MinHash-estimation pipeline. */
object ProfileQ61 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import graft.dedup.{DedupOps, NGramArray, SortedArraysJaccard}

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sig = time("sig+checkpoint") {
      DedupOps.withMinhashSignature(base, "text", k = 5, numHashes = 8)
        .drop("text").localCheckpoint()
    }
    val cand = DedupOps.lshCandidatePairs(sig, "doc_id", 8, 2)
    val nCand = time("cand count")(cand.count())
    println(s"[prof] candidate pairs: $nCand")
    val sigA = sig.select(col("doc_id").as("id_a") +:
      (0 until 8).map(i => col(s"m$i").as(s"_ma$i")): _*)
    val sigB = sig.select(col("doc_id").as("id_b") +:
      (0 until 8).map(i => col(s"m$i").as(s"_mb$i")): _*)
    val grams = base.select(col("doc_id"),
      column(NGramArray(expression(col("text")), 3)).as("_g"))
    val agree = (0 until 8).map(i =>
      when(col(s"_ma$i") === col(s"_mb$i"), 1).otherwise(0)).reduce(_ + _)
    val sigJoined = cand.join(sigA, Seq("id_a")).join(sigB, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(agree / lit(8.0), 6).as("est_jaccard"))
    time("sig joins + est (noop)") {
      sigJoined.write.format("noop").mode("overwrite").save()
    }
    val withGrams = cand
      .join(grams.select(col("doc_id").as("id_a"), col("_g").as("_ga")), Seq("id_a"))
      .join(grams.select(col("doc_id").as("id_b"), col("_g").as("_gb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(column(SortedArraysJaccard(
          expression(col("_ga")), expression(col("_gb")))), 6).as("jaccard"))
    time("gram joins + jaccard (noop)") {
      withGrams.write.format("noop").mode("overwrite").save()
    }
    time("full q61 (noop)") {
      graft.SparkEntry.queries("q61_minhash_estimate")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
