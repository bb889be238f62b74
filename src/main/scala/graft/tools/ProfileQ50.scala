package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.DedupOps

/** Stage-by-stage timing of the q50 near-dup clustering pipeline. */
object ProfileQ50 {
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
      println(f"[q50] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // shipped query first: closest to the bench's cold-lineage cost
    time("full q50 (as shipped, cold)") {
      DedupOps.nearDupClusters(docs, "doc_id", "text", threshold = 0.5)
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full q50 (warm)") {
      DedupOps.nearDupClusters(docs, "doc_id", "text", threshold = 0.5)
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }

    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import graft.dedup.{NGramArray, SortedArraysJaccard}
    val base = docs
    time("sig only count") {
      DedupOps.withMinhashSignature(base, "text", 5, 8).drop("text")
        .write.format("noop").mode("overwrite").save()
    }
    time("bucket lists (pre-explode)") {
      val sig = DedupOps.withMinhashSignature(base, "text", 5, 8).drop("text")
      import graft.dedup.DedupOps.bandKey
      val sigRef = (0 until 8).map(i => col(s"m$i"))
      val bands = (0 until 4).map(b => bandKey(sigRef, b, 2))
      sig.withColumn("band", explode(array(bands: _*)))
        .select(col("doc_id"), col("band"))
        .filter(col("band").isNotNull)
        .groupBy(col("band")).agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
        .write.format("noop").mode("overwrite").save()
    }
    time("pairs no-distinct count") {
      val sig = DedupOps.withMinhashSignature(base, "text", 5, 8).drop("text")
      import graft.dedup.DedupOps.bandKey
      val sigRef = (0 until 8).map(i => col(s"m$i"))
      val bands = (0 until 4).map(b => bandKey(sigRef, b, 2))
      val n = sig.withColumn("band", explode(array(bands: _*)))
        .select(col("doc_id"), col("band"))
        .filter(col("band").isNotNull)
        .groupBy(col("band")).agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(col("ids")).as("id_a"), col("ids"))
        .select(col("id_a"), explode(col("ids")).as("id_b"))
        .filter(col("id_a") < col("id_b")).count()
      println("  rawPairs=" + n)
    }
    time("sig+cand count") {
      val sig = DedupOps.withMinhashSignature(base, "text", 5, 8).drop("text")
      println("  cand=" + DedupOps.lshCandidatePairs(sig, "doc_id", 8, 2).count())
    }
    val edges = {
      val sig = DedupOps.withMinhashSignature(base, "text", 5, 8).drop("text")
      val cand = DedupOps.lshCandidatePairs(sig, "doc_id", 8, 2)
      val grams = base.select(col("doc_id"),
        column(NGramArray(expression(col("text")), 3)).as("_g"))
      cand
        .join(grams.select(col("doc_id").as("id_a"), col("_g").as("_ga")), Seq("id_a"))
        .join(grams.select(col("doc_id").as("id_b"), col("_g").as("_gb")), Seq("id_b"))
        .filter(round(column(SortedArraysJaccard(
          expression(col("_ga")), expression(col("_gb")))), 6) >= 0.5)
        .select(col("id_a").as("a"), col("id_b").as("b"))
    }
    time("edges count (gram merge)")(println("  edges=" + edges.count()))
    val cc = time("connectedComponents") {
      DedupOps.connectedComponents(base.select(col("doc_id").as("id")), edges)
    }
    time("final write") {
      import org.apache.spark.sql.expressions.Window
      cc.select(col("id").as("doc_id"), col("cluster_id"))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))).cast("long"))
        .withColumn("is_rep", col("doc_id") === col("cluster_id"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
