package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.DedupOps
import graft.queries.ClusterMemo

/** VERDICT r11 item 4: q108's admission trio (corpus labels, corpus
  * band index, q76's doc artifacts) was deliberately kept EAGER on an
  * unreproduced suspicion — profile it properly. This probe times the
  * COLD build-the-trio-then-fold sequence (the only part the
  * eager/lazy flag can affect; Bench's q108 min-of-3 rides warm memos)
  * under three pin policies, same JVM, strictly alternating:
  *
  *   eager      — the shipped ClusterMemo behavior (all three eager);
  *   lazy_index — band index lazy (its ONE reference in the fold plan
  *                makes a lazy pin safe: build+serialize+consume in a
  *                single pass), labels eager (referenced three times —
  *                both quotient join sides and the docSuper spine);
  *   lazy_all   — labels lazy too, to measure the duplicate-build cost
  *                the multi-reference rule predicts.
  *
  * Emits PROBE_Q108_PINS.json.
  */
object ProbeQ108Pins {

  private val Threshold = 0.5
  private val BatchMod = 10

  private def fold(s: SparkSession, d: String, eagerLabels: Boolean,
                   eagerIndex: Boolean): DataFrame = {
    val docs = s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % BatchMod =!= 0)
    val batch = docs.filter(col("doc_id") % BatchMod === 0)
    // the ClusterMemo builds, memo-free, with the pin policy under test
    val labels = DedupOps.nearDupClusters(corpus, "doc_id", "text", Threshold)
      .select(col("doc_id"), col("cluster_id"))
      .localCheckpoint(eagerLabels, StorageLevel.MEMORY_AND_DISK_SER)
    val index = DedupOps.bandIndex(corpus, "doc_id", "text",
        ClusterMemo.ShingleK, ClusterMemo.NumHashes, ClusterMemo.RowsPerBand,
        ClusterMemo.NGram)
      .localCheckpoint(eagerIndex, StorageLevel.MEMORY_AND_DISK_SER)
    DedupOps.incrementalClustersFromIndex(index, batch, labels,
        "doc_id", "text", threshold = Threshold)
      .orderBy(col("doc_id"))
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val variants: Seq[(String, (Boolean, Boolean))] = Seq(
      "eager" -> (true, true),
      "lazy_index" -> (true, false),
      "lazy_all" -> (false, false))

    def run(el: Boolean, ei: Boolean): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      fold(spark, d, el, ei).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc()
      dt
    }
    variants.foreach { case (_, (el, ei)) => run(el, ei) } // codegen warm
    val samples = (1 to repeats).map { r =>
      val row = variants.map { case (name, (el, ei)) =>
        val t = run(el, ei)
        System.err.println(f"[q108pins] rep $r $name%-10s $t%.3f")
        name -> t
      }
      row
    }
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val byName = variants.map(_._1).map { n =>
      val vs = samples.map(_.find(_._1 == n).get._2)
      s""""$n":{"samples":[${vs.map(num).mkString(",")}],"min":${num(vs.min)}}"""
    }
    val line = s"""{"metric":"q108_trio_pin_ab","unit":"sec","sf":"$d",""" +
      s""""repeats":$repeats,"protocol":"cold trio build + fold per run (full unpersist), same JVM, strictly alternating, warmed; Bench's q108 number itself rides warm memos and is unaffected",""" +
      s""""variants":${byName.mkString("{", ",", "}")}}"""
    println(line)
    Files.writeString(Paths.get("PROBE_Q108_PINS.json"), line + "\n")
    spark.stop()
  }
}
