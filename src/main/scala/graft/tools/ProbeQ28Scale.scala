package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r11 item 6: q28's three multi-key count-distincts plan as
  * one Expand(3×) feeding a single exchange — at sf0.1 that exchange is
  * fixed-cost, so the keep-or-rewrite decision must be measured where
  * the exchange dominates. The ladder's inflater symlinks lineitem
  * unchanged, so this probe inflates LINEITEM itself (keys shifted per
  * copy to preserve distinct-count growth; returnflag untouched) and
  * A/Bs the shipped Expand shape against the §2.2 two-level rewrite
  * (one distinct-agg chain per count, joined at 3 rows) at ×1/×10/×30.
  * Emits PROBE_Q28.json.
  */
object ProbeQ28Scale {

  /** The shipped q28 shape (three count-distincts, one scan, Expand). */
  def current(li: DataFrame): DataFrame =
    li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey"), col("l_partkey")).as("n_supp_part"))
      .orderBy(col("l_returnflag"))

  /** Two-level rewrite: each count rides its own pre-deduped aggregate
    * (groupBy(flag, keys) → groupBy(flag)), joined on the ≤3-row flag
    * frame — three scans, three narrower exchanges, no Expand.
    */
  def split(li: DataFrame): DataFrame = {
    def dcount(keys: Seq[String], alias: String): DataFrame =
      li.select(("l_returnflag" +: keys).map(col): _*)
        .groupBy(("l_returnflag" +: keys).map(col): _*).agg(lit(1))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as(alias))
    dcount(Seq("l_orderkey"), "n_orders")
      .join(dcount(Seq("l_partkey"), "n_parts"), Seq("l_returnflag"))
      .join(dcount(Seq("l_suppkey", "l_partkey"), "n_supp_part"),
        Seq("l_returnflag"))
      .orderBy(col("l_returnflag"))
  }

  def inflate(spark: SparkSession, src: String, dst: String,
              n: Int): String = {
    val out = s"$dst/lineitem_x$n.parquet"
    if (Files.exists(Paths.get(out, "_SUCCESS"))) return out
    val li = spark.read.parquet(s"$src/lineitem.parquet")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"))
    val copies = spark.range(0, n).select(col("id").as("k"))
    // shift every key by k×ceiling so each copy contributes fresh
    // distinct values under every counted key (flag unchanged): the
    // distinct counts grow ×n exactly like the real table would
    li.crossJoin(copies)
      .select(col("l_returnflag"),
        (col("l_orderkey") + col("k") * 10000000L).as("l_orderkey"),
        (col("l_partkey") + col("k") * 1000000L).as("l_partkey"),
        (col("l_suppkey") + col("k") * 100000L).as("l_suppkey"))
      .repartition(32)
      .write.mode("overwrite").parquet(out)
    out
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val rungs = sys.env.get("SPARK_GRAFT_LADDER_RUNGS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 10, 30))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc()
      dt
    }

    val shapes: Seq[(String, DataFrame => DataFrame)] =
      Seq("expand" -> current _, "split" -> split _)
    // warm codegen on the small rung
    val w = spark.read.parquet(s"$src/lineitem.parquet")
    shapes.foreach { case (_, f) => time(f(w)) }

    val rows = rungs.map { n =>
      val path =
        if (n == 1) s"$src/lineitem.parquet"
        else inflate(spark, src, "target/q28scale", n)
      val li = spark.read.parquet(path)
      // equivalence at every rung before timing: same 3 rows
      val a = current(li).collect().map(_.toString).sorted
      val b = split(li).collect().map(_.toString).sorted
      require(a.sameElements(b),
        s"×$n: split shape diverged from the shipped shape")
      val t = shapes.map { case (name, f) =>
        val ts = (1 to repeats).map { r =>
          System.err.println(s"[q28probe] ×$n $name ($r/$repeats)")
          time(f(li))
        }
        name -> ts.min
      }
      System.err.println(
        s"[q28probe] ×$n " + t.map { case (k, v) => s"$k=${num(v)}" }
          .mkString(" "))
      s""""x$n":{${t.map { case (k, v) => s""""$k":${num(v)}""" }
        .mkString(",")}}"""
    }
    val line = s"""{"metric":"q28_expand_vs_split","unit":"sec",""" +
      s""""sf":"$src","repeats":$repeats,""" +
      s""""note":"min of $repeats per shape per rung, equivalence checked by collect at every rung","rungs":${rows.mkString("{", ",", "}")}}"""
    println(line)
    Files.writeString(Paths.get("PROBE_Q28.json"), line + "\n")
    spark.stop()
  }
}
