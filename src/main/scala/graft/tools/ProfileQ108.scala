package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.DedupOps
import graft.queries.ClusterMemo

/** Stage-by-stage timing of the q108 incremental-cluster MARGINAL fold
  * (memos pre-populated, as in bench repeats 2..n).
  */
object ProfileQ108 {
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
      println(f"[q108] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import graft.dedup.{NGramArray, SortedArraysJaccard}

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 10 === 0)

    time("memo: corpusLabels (build)") {
      ClusterMemo.corpusLabels(spark, dir, 0.5, 10).count()
    }
    time("memo: corpusBandIndex (build)") {
      ClusterMemo.corpusBandIndex(spark, dir, 10).count()
    }
    val oldLabels = ClusterMemo.corpusLabels(spark, dir, 0.5, 10)
    val index = ClusterMemo.corpusBandIndex(spark, dir, 10)

    for (round <- 1 to 3) {
      time(s"full marginal fold (r$round)") {
        DedupOps.incrementalClustersFromIndex(
            index, batch, oldLabels, "doc_id", "text", 0.5)
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }

    // pieces
    val batchF = time("batchF featurize+checkpoint") {
      DedupOps.withMinhashSignature(
          batch.select(col("doc_id"), col("text")), "text", 5, 8)
        .withColumn("_g", column(NGramArray(expression(col("text")), 3)))
        .drop("text")
        .localCheckpoint()
    }
    time("batchF count") { batchF.count() }
    val batchGrams = batchF.select(col("doc_id").as("id_a"), col("_g").as("_ga"))
    val bb = time("bb edges") {
      val e = DedupOps.lshCandidatePairs(batchF, "doc_id", 8, 2)
        .join(batchGrams, Seq("id_a"))
        .join(batchF.select(col("doc_id").as("id_b"), col("_g").as("_gb")),
          Seq("id_b"))
        .filter(round(column(SortedArraysJaccard(
          expression(col("_ga")), expression(col("_gb")))), 6) >= 0.5)
        .select(col("id_a"), col("id_b"))
      e.count(); e
    }
    val sigRef = (0 until 8).map(i => col(s"m$i"))
    val bandCols = (0 until 4).map(b => DedupOps.bandKey(sigRef, b, 2))
    val batchBands = batchF
      .select(col("doc_id").as("id_a"), explode(array(bandCols: _*)).as("band"))
      .filter(col("band").isNotNull)
    val bc = time("bc probe+verify") {
      val e = index.select(col("band"), explode(col("cands")).as("c"))
        .join(broadcast(batchBands), Seq("band"))
        .select(col("id_a"), col("c.id").as("id_b"), col("c.g").as("_gb"))
        .join(broadcast(batchGrams), Seq("id_a"))
        .filter(round(column(SortedArraysJaccard(
          expression(col("_ga")), expression(col("_gb")))), 6) >= 0.5)
        .select(col("id_a"), col("id_b"))
      e.count(); e
    }
    val edges = time("edges union+distinct") {
      val e = bb.unionByName(bc).distinct(); e.count(); e
    }
    val m = oldLabels.select(col("doc_id").as("_mid"), col("cluster_id").as("_ml"))
    val quotient = time("quotient fold") {
      val q = edges
        .join(m.withColumnRenamed("_mid", "id_a")
          .withColumnRenamed("_ml", "_la"), Seq("id_a"), "left")
        .join(m.withColumnRenamed("_mid", "id_b")
          .withColumnRenamed("_ml", "_lb"), Seq("id_b"), "left")
        .select(coalesce(col("_la"), col("id_a")).as("a"),
          coalesce(col("_lb"), col("id_b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      q.count(); q
    }
    val superNodes = oldLabels.select(col("cluster_id").as("id")).distinct()
      .unionByName(batchF.select(col("doc_id").as("id")))
    val sc = time("connectedComponents") {
      val r = DedupOps.connectedComponents(superNodes, quotient)
        .select(col("id").as("_sup"), col("cluster_id"))
      r.count(); r
    }
    time("final label join+window+sort") {
      import org.apache.spark.sql.expressions.Window
      val docSuper = oldLabels.select(col("doc_id"), col("cluster_id").as("_sup"))
        .unionByName(batchF.select(col("doc_id"), col("doc_id").as("_sup")))
      docSuper.join(sc, Seq("_sup"))
        .select(col("doc_id"), col("cluster_id"))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))).cast("long"))
        .withColumn("is_rep", col("doc_id") === col("cluster_id"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
