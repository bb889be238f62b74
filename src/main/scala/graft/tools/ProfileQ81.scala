package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Stage-level timing for q81 (sketch-gated Levenshtein verify): where
  * do the seconds go — memoized pair production, the gate, the text
  * joins, or the DP itself?
  */
object ProfileQ81 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    time("scoredPairs (cold memo)") {
      graft.queries.ClusterMemo.scoredPairs(spark, d).count()
    }
    time("scoredPairs (warm)") {
      graft.queries.ClusterMemo.scoredPairs(spark, d).count()
    }
    val gated = graft.queries.ClusterMemo.scoredPairs(spark, d)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
    time("gate only") { gated.count() }
    val t = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), TextOps.normalize(col("text")).as("_n"))
    val joined = gated
      .join(t.select(col("doc_id").as("id_a"), col("_n").as("_na")),
        Seq("id_a"))
      .join(t.select(col("doc_id").as("id_b"), col("_n").as("_nb")),
        Seq("id_b"))
    time("gate + text joins") { joined.count() }
    time("+ levenshtein") {
      joined.withColumn("ed", levenshtein(col("_na"), col("_nb")))
        .agg(sum(col("ed"))).count()
    }
    time("full q81") {
      graft.queries.Pipeline7.queries("q81_editdist_neardup")(spark, d)
        .write.format("noop").mode("overwrite").save()
      0L
    }
    time("full q81 again") {
      graft.queries.Pipeline7.queries("q81_editdist_neardup")(spark, d)
        .write.format("noop").mode("overwrite").save()
      0L
    }
    // variants: isolate the orderBy double-exec vs expression re-inlining
    val base = joined.withColumn("edit_dist",
      levenshtein(col("_na"), col("_nb")).cast("long"))
      .withColumn("rel_dist",
        when(greatest(length(col("_na")), length(col("_nb"))) === 0,
          lit(0.0))
          .otherwise(round(col("edit_dist").cast("double") /
            greatest(length(col("_na")), length(col("_nb"))), 6)))
      .withColumn("is_near", col("rel_dist") <= 0.4)
      .select(col("id_a"), col("id_b"), col("est_jaccard"),
        col("edit_dist"), col("rel_dist"), col("is_near"))
    time("derived cols, no orderBy") {
      base.write.format("noop").mode("overwrite").save(); 0L
    }
    time("derived cols + orderBy") {
      base.orderBy(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("edit_dist only + orderBy") {
      joined.withColumn("edit_dist",
        levenshtein(col("_na"), col("_nb")).cast("long"))
        .select(col("id_a"), col("id_b"), col("edit_dist"))
        .orderBy(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    val par = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val joinedPar = gated.repartition(par, col("id_a"), col("id_b"))
      .join(t.select(col("doc_id").as("id_a"), col("_n").as("_na")),
        Seq("id_a"))
      .join(t.select(col("doc_id").as("id_b"), col("_n").as("_nb")),
        Seq("id_b"))
    time("repartitioned DP, no orderBy") {
      joinedPar.withColumn("edit_dist",
        levenshtein(col("_na"), col("_nb")).cast("long"))
        .select(col("id_a"), col("id_b"), col("edit_dist"))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("repartitioned DP + orderBy") {
      joinedPar.withColumn("edit_dist",
        levenshtein(col("_na"), col("_nb")).cast("long"))
        .select(col("id_a"), col("id_b"), col("edit_dist"))
        .orderBy(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    spark.stop()
  }
}
