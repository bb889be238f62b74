package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.{GramMemo, Pipeline16}

/** Branch-by-branch timing of the q126 source-health dashboard (warm
  * words/winnow memos, as in bench repeats 2..n).
  */
object ProfileQ126 {
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
      println(f"[q126] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("memo: words (build)") { GramMemo.words(spark, dir).count() }
    time("memo: winnow (build)") { GramMemo.winnow(spark, dir).count() }
    for (round <- 1 to 3)
      time(s"q126 full (r$round)") {
        graft.SparkEntry.queries("q126_source_health")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    for ((label, df) <- Pipeline16.healthBranches(spark, dir))
      for (round <- 1 to 2)
        time(s"branch $label (r$round)") {
          df.write.format("noop").mode("overwrite").save()
        }
    spark.stop()
  }
}
