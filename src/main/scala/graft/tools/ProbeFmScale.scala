package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Verify
import graft.text.TextOps

/** The feature store's economics at 1x and 10x (the Scale10 corpus):
  * a stored feature table pays one BUILD and serves every consumer a
  * cheap READ, while the inline alternative pays a corpus text scan +
  * TextStats pass PER consumer. At sf0.1 the two per-consumer costs
  * are close (the native one-pass expressions made inline cheap; see
  * the REPRO round-9 adjudication), so the decisive number is how the
  * gap scales: the inline pass grows with the CORPUS, the read with
  * the ~1%-sized feature table. Emits per-scale
  * {build, warm_read, inline_pass, breakeven_consumers} where
  * breakeven = build / (inline_pass - warm_read) — the number of
  * feature consumers above which the store wins outright (the board
  * has ~22).
  */
object ProbeFmScale {

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = "target/scale10/data"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Verify.silenceIntendedGlobalWindowWarn()

    Scale10.inflate(spark, src, dst)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc(); dt
    }

    // the representative consumer payload: a per-source aggregate over
    // every stored feature (cheap on purpose — the probe isolates the
    // SOURCE cost, inline pass vs stored read)
    def consume(feats: DataFrame): Unit = {
      feats.groupBy(col("source"))
        .agg(count(lit(1)), sum(col("n_tokens_ws")), avg(col("quality")),
          countDistinct(col("lang_pred")), max(col("n_chars")))
        .write.format("noop").mode("overwrite").save()
      ()
    }

    def inlineFeatures(dir: String): DataFrame =
      graft.queries.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          length(col("text")).cast("long").as("n_chars"),
          TextOps.qualityScore(col("text")).as("quality"),
          TextOps.langId(col("text")).as("lang_pred"),
          TextOps.tokenCountWs(col("text")).as("n_tokens_ws"),
          TextOps.tokenCountBpe(col("text")).as("n_tokens_bpe"),
          TextOps.fingerprint(col("text")).as("fp"))

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val rows = Seq("x1" -> src, "x10" -> dst).map { case (label, dir) =>
      // one untimed pass for codegen/JIT
      consume(inlineFeatures(dir))
      val build = (1 to repeats).map { _ =>
        graft.queries.FeatureMemo.clear()
        time(graft.queries.FeatureMemo.features(spark, dir).count())
      }.min
      val read = (1 to repeats).map { _ =>
        time(consume(graft.queries.FeatureMemo.features(spark, dir)))
      }.min
      val inline = (1 to repeats).map { _ =>
        time(consume(inlineFeatures(dir)))
      }.min
      val breakeven =
        if (inline > read) build / (inline - read) else Double.NaN
      System.err.println(s"[fmscale] $label build=${num(build)} " +
        s"read=${num(read)} inline=${num(inline)} be=${num(breakeven)}")
      s""""$label":{"build_sec":${num(build)},"warm_read_sec":${num(read)},"inline_pass_sec":${num(inline)},"breakeven_consumers":${num(breakeven)}}"""
    }
    val line = s"""{"metric":"feature_store_scale","unit":"sec","sf":"$src","repeats":$repeats,"scales":${rows.mkString("{", ",", "}")}}"""
    println(line)
    try Files.writeString(Paths.get("FEATURE_STORE_SCALE.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[fmscale] could not write artifact: $e")
    }
    spark.stop()
  }
}
