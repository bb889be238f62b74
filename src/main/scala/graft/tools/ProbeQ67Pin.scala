package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

import graft.dedup.{Bloom, NGramArray}

/** VERDICT r11 item 8: q67's eval-gram localCheckpoint was kept on
  * scale rationale with a locally-flat A/B inside a 2× host window —
  * one clean same-JVM alternating A/B decides it. Replicates q67's
  * exact plan with and without the pin (the pinned variant is the
  * shipped Pipeline5 shape), alternates the variants so a drifting
  * host window hits both equally, and emits PROBE_Q67_PIN.json.
  */
object ProbeQ67Pin {

  private def q67(s: SparkSession, d: String, pin: Boolean): DataFrame = {
    val n = 8
    val docs = s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"),
        column(NGramArray(expression(col("text")), n)).as("_g"))
    val evalRaw = docs.filter(col("doc_id") % 10 === 0)
      .select(explode(col("_g")).as("gram")).distinct()
    val evalG = if (pin) evalRaw.localCheckpoint() else evalRaw
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), explode(col("_g")).as("gram"))
    val probed = Bloom.probeBitset(corpus, "gram", evalG)
    val exact = broadcast(evalG.withColumn("_hit", lit(1)))
    probed.join(exact, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_bloom"), 1L).otherwise(0L)).as("n_bloom_hits"),
        count(col("_hit")).as("n_exact_hits"))
      .withColumn("n_false_pos", col("n_bloom_hits") - col("n_exact_hits"))
      .withColumn("is_clean", col("n_bloom_hits") === 0)
      .orderBy(col("doc_id"))
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "7").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(pin: Boolean): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      q67(spark, d, pin).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc()
      dt
    }
    // warm both codegen paths
    run(pin = true); run(pin = false)
    // alternate so a sliding host window hits both variants equally
    val samples = (1 to repeats).map { r =>
      val tp = run(pin = true)
      val tn = run(pin = false)
      System.err.println(f"[q67pin] rep $r: pinned=$tp%.3f unpinned=$tn%.3f")
      (tp, tn)
    }
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val line = s"""{"metric":"q67_evalgram_pin_ab","unit":"sec","sf":"$d",""" +
      s""""repeats":$repeats,"protocol":"same JVM, strictly alternating, full unpersist per run, warmed",""" +
      s""""pinned":[${samples.map(x => num(x._1)).mkString(",")}],""" +
      s""""unpinned":[${samples.map(x => num(x._2)).mkString(",")}],""" +
      s""""pinned_min":${num(samples.map(_._1).min)},""" +
      s""""unpinned_min":${num(samples.map(_._2).min)}}"""
    println(line)
    Files.writeString(Paths.get("PROBE_Q67_PIN.json"), line + "\n")
    spark.stop()
  }
}
