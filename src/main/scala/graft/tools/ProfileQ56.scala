package graft.tools

import org.apache.spark.sql.SparkSession

/** Quick wall-clock of the newest pipeline queries at a given sf dir. */
object ProfileQ56 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args.drop(1) match {
        case more if more.nonEmpty => more.toSeq
        case _ => Seq("q55_source_quota", "q56_decontaminate",
          "q57_repetition_ratio")
      }) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] $q%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
