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
               element_at(minhash_sig('hello graft world'), 1) AS m
      """).head()
      assert(row.getLong(0) == 10L)
      assert(row.getString(1).length == 8)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
