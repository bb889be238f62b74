package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-by-stage timing of q94's prefix-Jaccard internals (words memo
  * pre-populated — the bench steady state).
  */
object ProfileQ94Stages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("Q94_CODEGEN_CACHE", "100"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q94] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import graft.dedup.{NGramArray, SortedArraysJaccard}
    val threshold = 0.5

    for (wq <- sys.env.get("Q94_WARMQ").toSeq.flatMap(_.split(",").toSeq)) {
      val name = graft.SparkEntry.queries.keys.find(_.startsWith(wq)).get
      time(s"warmup $name") {
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    if (sys.env.contains("Q94_BENCH_LIKE") ||
      sys.env.contains("Q94_WARM_ONLY") || sys.env.contains("Q94_Q1_ONLY")) {
      time("warmup q1") {
        graft.SparkEntry.queries.head._2(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      if (!sys.env.contains("Q94_Q1_ONLY")) time("warmup q50") {
        graft.SparkEntry.queries("q50_neardup_clusters")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("words memo build") {
      graft.queries.GramMemo.words(spark, dir).count()
    }
    val w = graft.queries.GramMemo.words(spark, dir)

    for (r <- 1 to 4) time(s"full q94 fn (memoized, r$r)") {
      graft.SparkEntry.queries("q94_prefix_jaccard_pairs")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      if (sys.env.contains("Q94_BENCH_LIKE") ||
        sys.env.contains("Q94_GC_ONLY")) System.gc()
    }

    val g = w.select(col("doc_id").as("_id"),
      column(NGramArray(expression(col("words")), 3)).as("_g"))
    time("gram arrays only") {
      g.write.format("noop").mode("overwrite").save()
    }
    val dg = g.select(col("_id"), explode(col("_g")).as("_gram"))
      .select(col("_id"), md5(to_binary(col("_gram"), lit("utf-8"))).as("_gk"))
    time("dg explode+md5 only") {
      dg.write.format("noop").mode("overwrite").save()
    }
    val dgdf = dg.withColumn("_df",
      count(lit(1)).over(Window.partitionBy(col("_gk"))))
    time("df window") {
      dgdf.write.format("noop").mode("overwrite").save()
    }
    val ranked0 = dgdf.groupBy(col("_id"))
      .agg(transform(sort_array(collect_list(struct(col("_df"), col("_gk")))),
        x => x.getField("_gk")).as("_rare"))
    val ranked = time("ranked agg + checkpoint") { ranked0.localCheckpoint() }
    val prefix = ranked
      .withColumn("_n", size(col("_rare")))
      .withColumn("_plen",
        (col("_n") - ceil(lit(threshold) * col("_n")) + 1).cast("int"))
      .select(col("_id"), col("_n"),
        posexplode(slice(col("_rare"), lit(1), col("_plen")))
          .as(Seq("_p0", "_gk")))
      .select(col("_gk"),
        struct(col("_id"), col("_n"), (col("_p0") + 1).as("_p")).as("_e"))
    val pairs = prefix.groupBy(col("_gk"))
      .agg(collect_list(col("_e")).as("es"))
      .select(explode(col("es")).as("_a"), col("es"))
      .select(col("_a"), explode(col("es")).as("_b"))
      .filter(col("_a._id") < col("_b._id"))
      .filter((lit(1) + least(col("_a._n") - col("_a._p"),
          col("_b._n") - col("_b._p"))).cast("double") >=
        lit(threshold / (1.0 + threshold)) *
          (col("_a._n") + col("_b._n")))
      .select(col("_a._id").as("id_a"), col("_b._id").as("id_b"))
      .distinct()
    val pc = time("candidate pairs (count)") { val p = pairs.localCheckpoint(); p.count() }
    println(s"[q94] candidates: $pc")
    val sets = ranked.select(col("_id"), sort_array(col("_rare")).as("_set"))
    time("verify join") {
      pairs.join(sets.select(col("_id").as("id_a"), col("_set").as("_ga")),
          Seq("id_a"))
        .join(sets.select(col("_id").as("id_b"), col("_set").as("_gb")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(column(SortedArraysJaccard(
            expression(col("_ga")), expression(col("_gb")))), 6)
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
