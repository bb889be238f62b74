package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing of the q54 embedding clustering pipeline (and q50 for
  * regression comparison) — the connected-components loop's round count
  * and per-round cost are the quantities of interest.
  */
object ProfileQ54 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val edges = time("nearDupPairs materialize") {
      val e = graft.sim.Similarity.nearDupPairs(emb, threshold = 0.2)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      println(s"[prof]   edges = ${e.count()}")
      e
    }
    time("q54 full (cold)") {
      graft.queries.Pipeline3.queries("q54_embedding_clusters")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("cc alone") {
      graft.dedup.DedupOps
        .connectedComponents(emb.select(col("vec_id").as("id")), edges)
        .write.format("noop").mode("overwrite").save()
    }
    time("q50 full (regression)") {
      graft.SparkEntry.queries("q50_neardup_clusters")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
