package graft.tools

import org.apache.spark.sql.SparkSession

/** Executed-plan scan audit: for each query name (comma-separated in
  * args(0), default the current bench top costs), materializes the query
  * and counts FileScan occurrences per table in the POST-AQE plan —
  * the redundant-corpus-scan hunt that found the q111 24-scan plan.
  *   sbt "runMain graft.tools.ScanAudit q50,q76 [sfDir]"
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q50_neardup_clusters", "q76_incremental_dedup",
        "q86_containment_pairs", "q81_editdist_neardup",
        "q28_distinct_counts", "q70_curation_decision",
        "q67_bloom_decontaminate", "q96_dsir_weights", "q43_simhash_hamming_pairs"))
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val full = graft.SparkEntry.queries.keys.find(_.startsWith(n)).getOrElse(n)
      try {
        val df = graft.SparkEntry.queries(full)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.executedPlan.toString
        val scans = "FileScan parquet [^\\[]*\\[([^\\]]*)\\][^\n]*?([a-z]+)\\.parquet".r
        val perTable = "file:[^,\\]]*?/([a-z]+)\\.parquet".r
          .findAllMatchIn(plan).map(_.group(1)).toSeq
            .groupBy(identity).view.mapValues(_.size).toMap
        val nScans = plan.split("FileScan parquet").length - 1
        val rdd = plan.split("Scan ExistingRDD").length - 1
        println(s"AUDIT $full fileScans=$nScans rddScans=$rdd perTable=$perTable")
      } catch { case e: Throwable =>
        println(s"AUDIT $full ERROR ${e.getMessage}")
      }
    }
  }
}
