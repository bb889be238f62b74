package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Salt

/** Scale-mechanics evidence: salted aggregation equals the plain groupBy
  * on skewed data, and bucketed tables join without an Exchange.
  */
class ScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("salted aggregation == plain groupBy on a skewed key") {
    import spark.implicits._
    // 90% of rows share one key — the classic hot-key shape
    val skewed = spark.range(100000)
      .select(when(col("id") % 10 === 0, concat(lit("k"), col("id") % 7))
        .otherwise(lit("HOT")).as("k"),
        (col("id") % 1000).cast("double").as("v"))

    val plain = skewed.groupBy("k")
      .agg(sum("v").as("total"), count("v").as("n"))
    val salted = Salt.saltedAgg(skewed, Seq("k"),
      Seq(("v", "sum", "total"), ("v", "count", "n")))

    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0 &&
      salted.exceptAll(plain).count() == 0)
  }

  test("LSH bucket cap fails loudly on a pathological band") {
    import graft.dedup.DedupOps
    // 50 exact copies of one text: every band bucket holds all 50 ids —
    // exactly the input the exact-dedup precondition exists to forbid
    val dup = spark.range(50).select(col("id").as("doc_id"),
      lit("same text everywhere for every doc").as("text"))
    val sig = DedupOps.withMinhashSignature(dup, "text", 5, 8).drop("text")
    val e = intercept[Exception] {
      DedupOps.lshCandidatePairs(sig, "doc_id", 8, 2, maxBucket = 10).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("maxBucket") && m.contains("EXACT dedup")),
      s"expected loud bucket-cap failure, got: ${messages(e).mkString(" | ")}")
    // under the default cap the same input still computes (50^2 pairs)
    assert(DedupOps.lshCandidatePairs(sig, "doc_id", 8, 2).count() == 50L * 49 / 2)
  }

  test("bucketed tables join with zero shuffle (co-located join)") {
    // tables land in the default ./spark-warehouse (gitignored); a fresh
    // in-memory catalog doesn't know leftover locations from earlier runs,
    // so clear them on disk too
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    for (t <- Seq("li_b", "o_b")) {
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists())
        scala.reflect.io.Directory(dir).deleteRecursively()
    }
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucketing pre-partitions both sides: no Exchange under the join
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free co-located join, got:\n$plan")
      assert(joined.count() ==
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("approximate scale-path twins track the exact operators") {
    // The oracle-gated queries use EXACT forms (engine-portable values);
    // at 100 TB the drop-in production variants are the sketch
    // aggregates: HLL++ for distinct counts (q53's doc_freq, q28) and
    // KLL/GK quantiles for token profiles (q62). Pin that the approx
    // twins stay within their documented error on real corpus data, so
    // the swap is a one-line change with known loss, not a leap.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val toks = docs.select(col("source"),
      graft.text.TextOps.tokenCountWs(col("text")).as("n_tokens"))

    val exactD = docs.select(countDistinct(col("text")).cast("double"))
      .head().getDouble(0)
    val approxD = docs.select(approx_count_distinct(col("text"), rsd = 0.02)
      .cast("double")).head().getDouble(0)
    assert(math.abs(approxD - exactD) / exactD <= 0.06,
      s"HLL(rsd=0.02) off by ${math.abs(approxD - exactD) / exactD}")

    val exact = graft.ops.Percentiles
      .exactByHistogram(toks, "source", "n_tokens", Seq("p90" -> 0.9))
      .select(col("source"), col("p90"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = toks.groupBy(col("source"))
      .agg(expr("approx_percentile(n_tokens, 0.9, 1000)").as("p90a"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    exact.foreach { case (src, p90) =>
      // approx_percentile(acc=1000) returns a true sample value within
      // 1/1000 rank error; token distributions are smooth enough that
      // 10% value tolerance is conservative
      assert(math.abs(approx(src) - p90) <= math.max(0.1 * p90, 2.0),
        s"$src: approx ${approx(src)} vs exact $p90")
    }
  }
}
