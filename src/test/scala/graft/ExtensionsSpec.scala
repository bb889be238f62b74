package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session built with GraftExtensions exposes the engine's expressions
  * to pure SQL (the shared-cluster deployment shape).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions session runs engine SQL functions") {
    // getOrCreate would silently reuse an extension-less session from an
    // earlier suite; suites run sequentially, so stopping it here is safe
    // (the next suite's getOrCreate builds a fresh one)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql("""
        SELECT bday_count(DATE'2023-12-15', DATE'2024-01-01') AS c,
               element_at(minhash_sig('hello graft world'), 1) AS m,
               simhash_sig('hello graft world') AS sh,
               ngram_jaccard('a b c d', 'b c d e') AS j,
               element_at(byte_histogram16(encode('ab', 'utf-8')), 7) AS h6
      """).head()
      assert(row.getLong(0) == 10L)
      assert(row.getString(1).length == 8)
      assert(row.getInt(2) >= 0 && row.getInt(2) < 65536)
      // grams {a b c, b c d} vs {b c d, c d e}: inter 1, union 3 —
      // rounded to 6 places, matching DedupOps.jaccardOfTexts
      assert(row.getDouble(3) == 0.333333)
      assert(row.getLong(4) == 2L) // 'a','b' both have high nibble 6

      val agg = spark.sql("""
        SELECT topk_by_score(s, i) AS top FROM VALUES
          (1.0, 10L), (3.0, 30L), (2.0, 20L), (3.0, 25L),
          (0.5, 5L), (2.5, 26L), (1.5, 15L) AS t(s, i)
      """).head().getSeq[org.apache.spark.sql.Row](0)
      assert(agg.map(r => (r.getLong(0), r.getDouble(1))) ==
        Seq(25L -> 3.0, 30L -> 3.0, 26L -> 2.5, 20L -> 2.0, 15L -> 1.5))

      // kmv_distinct: 100 distinct < k=256 -> the sketch is exact
      val kmv = spark.sql("""
        SELECT kmv_distinct(CAST(conv(substring(md5(CAST(v AS STRING)),
          1, 13), 16, 10) AS BIGINT)) AS est
        FROM (SELECT explode(sequence(1, 100)) AS v)
      """).head().getDouble(0)
      assert(kmv == 100.0)

      // hll family: direct estimate == fold of per-shard registers
      // (pure SQL deployment of the stored-sketch loop)
      val hll = spark.sql("""
        SELECT hll_distinct(md5(CAST(v AS STRING))) AS est
        FROM (SELECT explode(sequence(1, 2000)) AS v)
      """).head().getDouble(0)
      assert(math.abs(hll - 2000.0) / 2000.0 < 0.15)
      val hllFold = spark.sql("""
        SELECT hll_merge(regs) AS est FROM (
          SELECT v % 4 AS shard, hll_registers(md5(CAST(v AS STRING))) AS regs
          FROM (SELECT explode(sequence(1, 2000)) AS v) GROUP BY v % 4)
      """).head().getDouble(0)
      assert(hllFold == hll, "SQL register fold must equal the direct sketch")

      // dd_quantile: cents ladder 1..1000 — same closed-form sketch
      // lower bounds Pipeline17Spec pins for q131 (480/896/960)
      val ddq = spark.sql("""
        SELECT dd_quantile(v, 0.50) AS p50, dd_quantile(v, 0.90) AS p90,
               dd_quantile(v, 0.99) AS p99
        FROM (SELECT explode(sequence(1, 1000)) AS v)
      """).head()
      assert((ddq.getLong(0), ddq.getLong(1), ddq.getLong(2)) ==
        ((480L, 896L, 960L)))

      // wrong arity fails at analysis with the function named, not with
      // a builder IndexOutOfBoundsException
      val arityErr = intercept[Exception] {
        spark.sql("SELECT dot_cosine(array(1.0F))").collect()
      }
      assert(arityErr.getMessage.contains("dot_cosine"))
      assert(!arityErr.isInstanceOf[IndexOutOfBoundsException])

      // dot_cosine reads each side at its declared width: double arrays
      // (and mixed sides) evaluate; any NON-floating element type must
      // still fail at analysis — an unsafe-array read would reinterpret
      // raw bytes into silently wrong values
      val dd = spark.sql(
        "SELECT dot_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D))").head()
      assert(dd.getDouble(0) == 1.0)
      val typeErr = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT dot_cosine(array(1, 2), array(1, 2))").collect()
      }
      assert(typeErr.getMessage.contains("ARRAY<FLOAT>"))

      // dot_product: raw (unnormalized) sibling, same type gate
      val dp = spark.sql(
        "SELECT dot_product(array(1.0F, 2.0F), array(3.0D, 4.0D))").head()
      assert(dp.getDouble(0) == 11.0)
      val dpTypeErr = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT dot_product(array(1, 2), array(1, 2))").collect()
      }
      assert(dpTypeErr.getMessage.contains("ARRAY<FLOAT>"))

      // the float form still evaluates
      val cos = spark.sql(
        "SELECT dot_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F))").head()
      assert(cos.getDouble(0) == 1.0)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
