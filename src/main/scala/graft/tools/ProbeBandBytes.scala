package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

import graft.dedup.{DedupOps, MinHashSig, MinHashSigNum, NGramHashArray}

/** VERDICT r11 item 1 asked for "a ladder rung showing the
  * shuffle-bytes drop" of the hex→long band-key conversion. This probe
  * builds q50's BAND EXCHANGE — signature + verify-gram member structs
  * posexploded into band buckets — in both eras' dtypes over the same
  * corpus and reports wall time plus the exchange's actual shuffle
  * write bytes/records from a stage listener:
  *
  *   hex  — 8×8-hex-char signature components + 32-hex-char md5 band
  *          key (the r11 shapes);
  *   long — 8×8-byte longs + ONE packed 8-byte band key with the band
  *          index as a companion int (the r12 shapes).
  *
  * Buckets, members and pair sets are identical by the
  * MinHashNumEquivalenceSpec bijection; this probe measures only the
  * bytes the equality ships. Emits PROBE_BAND_BYTES.json.
  */
object ProbeBandBytes {

  private val K = 5
  private val NumHashes = 8
  private val RowsPerBand = 2

  private def bandExchange(s: SparkSession, d: String,
                           numeric: Boolean): DataFrame = {
    val base = s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sigArr =
      if (numeric) column(MinHashSigNum(expression(col("text")), K, NumHashes))
      else column(MinHashSig(expression(col("text")), K, NumHashes))
    val sig = base.select(col("doc_id"), sigArr.as("_sig"),
      column(NGramHashArray(expression(col("text")), 3)).as("_g"))
    val sigRef = (0 until NumHashes).map(i => element_at(col("_sig"), i + 1))
    val numBands = NumHashes / RowsPerBand
    val bands = (0 until numBands).map(b =>
      if (numeric) DedupOps.bandKeyNum(sigRef, b, RowsPerBand)
      else DedupOps.bandKey(sigRef, b, RowsPerBand))
    sig.select(col("doc_id"), col("_sig"), col("_g"),
        posexplode(array(bands: _*)).as(Seq("_bi", "band")))
      .filter(col("band").isNotNull)
      .groupBy(col("band"), col("_bi"))
      .agg(collect_list(struct(col("doc_id").as("id"), col("_sig").as("sig"),
        col("_g").as("g"))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(col("_bi"), size(col("ms")).as("m"))
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    object Acc extends SparkListener {
      @volatile var bytes = 0L
      @volatile var recs = 0L
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        bytes += e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        recs += e.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
      }
    }
    spark.sparkContext.addSparkListener(Acc)

    def run(numeric: Boolean): (Double, Long, Long) = {
      Acc.bytes = 0L; Acc.recs = 0L
      val t0 = System.nanoTime()
      bandExchange(spark, d, numeric)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // the listener bus is async; give stage-completed events a beat
      // to drain before reading the accumulators
      Thread.sleep(500)
      System.gc()
      (dt, Acc.bytes, Acc.recs)
    }
    run(numeric = false); run(numeric = true) // codegen warm
    val hex = (1 to repeats).map(_ => run(numeric = false))
    val num = (1 to repeats).map(_ => run(numeric = true))
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val hb = hex.map(_._2).max; val nb = num.map(_._2).max
    val line = s"""{"metric":"band_exchange_hex_vs_long","unit":"sec/bytes",""" +
      s""""sf":"$d","repeats":$repeats,""" +
      s""""hex":{"wall_min":${fmt(hex.map(_._1).min)},"shuffle_bytes":$hb,"shuffle_records":${hex.map(_._3).max}},""" +
      s""""long":{"wall_min":${fmt(num.map(_._1).min)},"shuffle_bytes":$nb,"shuffle_records":${num.map(_._3).max}},""" +
      s""""bytes_ratio":${fmt(nb.toDouble / hb)}}"""
    println(line)
    System.err.println(line)
    Files.writeString(Paths.get("PROBE_BAND_BYTES.json"), line + "\n")
    spark.stop()
  }
}
