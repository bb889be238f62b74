package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints physical plans for representative queries (plan-quality audit):
  *   sbt "runMain graft.tools.Plans [q03_join_agg ...]"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_project", "q03_join_agg", "q12_asof_backward",
        "q22_interpolate_multicurve", "q31_minhash_signature")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .explain("formatted")
    }
    spark.stop()
  }
}
