package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the POST-EXECUTION adaptive plan of a SparkEntry query (the
  * initial explain shows duplicate subplans that AQE stage-reuse dedupes
  * at runtime; this shows what actually ran):
  *   sbt "runMain graft.tools.ExecPlanQ <queryName> [sfDir]"
  */
object ExecPlanQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q113_source_kl")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println(s"==== $name executed plan ====")
    println(df.queryExecution.executedPlan.toString)
  }
}
