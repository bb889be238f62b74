package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot wall-clock probe for q94's prefix-filtered Jaccard join at
  * sf0.1 (3 reps, min is the steady number — REPRO.md protocol). Used
  * for the round-6 plan audit; not part of the query board.
  */
object Prof94 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime
      val n = graft.dedup.DedupOps
        .prefixJaccardPairs(docs, "doc_id", "text", 0.5).count()
      println(f"PROF rep$rep ${(System.nanoTime - t0) / 1e9}%.2f s ($n pairs)")
    }
    // Bench-shaped reps: the registered query (orderBy included) through
    // the noop sink, exactly what Bench times
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime
      graft.SparkEntry.queries("q94_prefix_jaccard_pairs")(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"PROF noop-rep$rep ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
