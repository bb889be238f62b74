package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datasets.FuturoIntradia
import graft.sources.DerivativosIntradia

class FuturoIntradiaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("DAP intraday snapshot: rate renames, decimals, forwards") {
    val snap = DerivativosIntradia.ler(spark,
      "/root/reference/tests/b3/data/derivativos_intradia_20260310_DAP.json")
    val out = FuturoIntradia.processar(snap, "DAP",
      java.sql.Date.valueOf("2026-03-10")).cache()
    assert(out.count() > 0)
    assert(out.columns.contains("taxa_ultima") &&
      !out.columns.contains("preco_medio"))
    // percent -> decimal applied
    assert(out.filter(col("taxa_ultima") > 1).count() == 0)
    assert(out.columns.contains("taxa_forward"))
    // spot rule: first vertex forward == its rate
    val first = out.orderBy("dias_uteis").select("taxa_ultima", "taxa_forward")
      .head()
    assert(first.getDouble(0) == first.getDouble(1))
  }

  test("DOL intraday snapshot keeps price columns") {
    val snap = DerivativosIntradia.ler(spark,
      "/root/reference/tests/b3/data/derivativos_intradia_20260310_DOL.json")
    val out = FuturoIntradia.processar(snap, "DOL",
      java.sql.Date.valueOf("2026-03-10"))
    assert(out.count() > 0)
    assert(out.columns.contains("preco_ultimo") &&
      !out.columns.contains("taxa_ultima"))
  }
}
