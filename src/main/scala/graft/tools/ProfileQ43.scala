package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiling main: times named SparkEntry queries (default: the
  * current bench heavies) at SPARK_GRAFT_SF_DIR and prints row counts.
  */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Verify.silenceIntendedGlobalWindowWarn()

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q32_lsh_candidate_pairs", "q22_interpolate_multicurve",
        "q28_distinct_counts", "q24_stn_pricing", "q03_join_agg",
        "q35_cosine_topk", "q46_embedding_neardup", "q20_business_days",
        "q15_string_ops")
    // warmup
    graft.SparkEntry.queries(names.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = (System.nanoTime() - t0) / 1e9
      val t2 = System.nanoTime()
      val rows = df.count()
      val t3 = (System.nanoTime() - t2) / 1e9
      println(f"[prof] $n%-30s noop=$t1%6.2f s  count=$t3%6.2f s  rows=$rows")
    }
    spark.stop()
  }
}
