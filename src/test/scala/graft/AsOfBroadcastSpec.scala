package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOf

/** The broadcast as-of must agree with the windowed as-of on the same
  * inputs (backward and forward, including exact-key ties and misses).
  */
class AsOfBroadcastSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("broadcast as-of == windowed as-of (events fixture)") {
    import graft.queries.Tables
    val ev = Tables.eventsMicros(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("ts_us").as("c_ts"), col("value").as("c_value"))

    for (fwd <- Seq(false, true)) {
      val win = AsOf.join(purchases, clicks, by = Seq.empty,
        leftOn = "ts_us", rightOn = "c_ts",
        payload = Seq("c_value" -> "v"), forward = fwd)
      val bc = AsOf.joinBroadcast(purchases, clicks,
        leftOn = "ts_us", rightOn = "c_ts",
        payload = Seq("c_value" -> "v"), forward = fwd)
      assert(win.count() == bc.count())
      assert(win.exceptAll(bc).count() == 0 && bc.exceptAll(win).count() == 0,
        s"forward=$fwd mismatch")
    }
  }
}
