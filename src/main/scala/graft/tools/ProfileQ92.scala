package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for q92 (in-engine NB lang classifier): where do
  * the seconds go — the words-artifact read, the vocab pivot, the model
  * broadcast build, or the scoring join?
  */
object ProfileQ92 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val langs = Seq("de", "en", "es", "fr", "zh")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[q92] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    time("words artifact build (cold)") {
      graft.queries.GramMemo.words(spark, d).count()
    }
    val words = graft.queries.GramMemo.words(spark, d)
    time("explode+count words checkpoint") {
      words.select(explode(col("words")).as("w")).count()
    }
    time("explode from parquet w/ normalize") {
      spark.read.parquet(s"$d/documents.parquet")
        .select(explode(split(graft.text.TextOps.normalize(col("text")),
          " ")).as("w")).count()
    }
    val wl = words
      .select(col("lang"), explode(col("words")).as("w"))
      .groupBy(col("w")).pivot("lang", langs)
      .agg(count(lit(1)))
      .select(col("w") +: langs.map(l =>
        coalesce(col(l), lit(0L)).as(s"c_$l")): _*)
    time("vocab pivot (no checkpoint)") { wl.count() }
    val wlc = wl.localCheckpoint()
    time("vocab pivot checkpoint (warm)") { wlc.count() }
    val cl = wlc.agg(
      sum(col("c_de")).as("cl_de"), langs.tail.map(l =>
        sum(col(s"c_$l")).as(s"cl_$l")): _*)
    val v = wlc.agg(count(lit(1)).as("v"))
    val model = wlc.crossJoin(broadcast(cl)).crossJoin(broadcast(v))
      .select(col("w") +: langs.map(l =>
        log((col(s"c_$l") + lit(1.0)) / (col(s"cl_$l") + col("v")))
          .as(s"lp_$l")): _*)
    val sumCols = langs.map(l => sum(col(s"lp_$l")).as(s"s_$l"))
    time("scoring join + doc agg") {
      words.select(col("doc_id"), col("lang"),
          explode(col("words")).as("w"))
        .join(broadcast(model), Seq("w"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sumCols.head, sumCols.tail: _*)
        .count()
    }
    time("full q92") {
      graft.SparkEntry.queries("q92_nb_lang_confusion")(spark, d).count()
    }
    time("full q92 again") {
      graft.SparkEntry.queries("q92_nb_lang_confusion")(spark, d).count()
    }
    spark.stop()
  }
}
