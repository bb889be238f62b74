package graft.tools

import org.apache.spark.sql.SparkSession

/** Hand-runnable plan dump for any SparkEntry query:
  *   sbt "runMain graft.tools.ExplainQ <queryName> [sfDir]"
  * Prints explain("formatted") — the pushdown / codegen / exchange audit
  * the verify recipe asks for per new operator.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Verifier.explainAll(spark, sfDir, args.headOption.toSeq)
  }
}

/** Split out so tests can call it too. */
object Verifier {
  def explainAll(spark: SparkSession, sfDir: String, names: Seq[String]): Unit =
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      println(s"==== $n ====")
      fn(spark, sfDir).explain("formatted")
    }
}
