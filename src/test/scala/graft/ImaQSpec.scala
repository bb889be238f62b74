package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ImaQ

class ImaQSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("IMA-Q HTML stock reader matches reference golden parquet") {
    val got = ImaQ.estoque(spark,
      "/root/reference/tests/tpf/data/imaq_20260204.html",
      java.sql.Date.valueOf("2026-02-04"))
    val want = spark.read.parquet(
      "/root/reference/tests/tpf/data/imaq_20260204.parquet")
    assert(got.columns.toSeq == want.columns.toSeq)
    assert(got.count() == want.count(), s"${got.count()} vs ${want.count()}")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
}
