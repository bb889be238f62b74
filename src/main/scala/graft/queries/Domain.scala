package graft.queries

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.BrCalendar
import graft.curve.Curve
import graft.functions._

/** Domain-operator coverage (SURVEY.md §2.7 calendar, §2.8 curve math)
  * exercised over the driver testdata, with exact DuckDB oracles.
  *
  * The business-day oracle embeds the Brazilian holiday list (public ANBIMA
  * data, old regime — all testdata dates precede the 2023-12-26 transition)
  * as a SQL VALUES list and counts weekdays with a closed form, so DuckDB
  * independently reproduces BrCalendar.
  */
object Domain {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------- q20
  // Business-day count + is-business-day over order/ship dates.
  private val q20: Q = (s, d) =>
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("o_orderdate").cast("date").as("order_d"),
        col("l_shipdate").cast("date").as("ship_d"))
      .withColumn("bdays", bday_count(col("order_d"), col("ship_d")))
      .withColumn("ship_is_bday", is_bday(col("ship_d")))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // shared generators (OracleSql) so the q20 calendar SQL cannot drift
  // from q23/q25's; the [1994, 2004) window covers the testdata range
  // (1995-2001) plus slack
  private def wdCountSql(a: String, b: String): String =
    OracleSql.wdCountSql(a, b)
  private lazy val holidayListSql: String = OracleSql.holidayListSql(1994, 2004)
  private def holCountSql(a: String, b: String): String =
    OracleSql.holCountSql(holidayListSql, a, b)

  private lazy val q20Sql: String = {
    val fwd = s"(${wdCountSql("order_d", "ship_d")} - ${holCountSql("order_d", "ship_d")})"
    val bwd = s"(${wdCountSql("ship_d", "order_d")} - ${holCountSql("ship_d", "order_d")})"
    s"""
    WITH base AS (
      SELECT l_orderkey, l_linenumber,
             CAST(o_orderdate AS DATE) AS order_d,
             CAST(l_shipdate AS DATE) AS ship_d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT l_orderkey, l_linenumber, order_d, ship_d,
           CAST(CASE WHEN order_d <= ship_d THEN $fwd ELSE -$bwd END AS BIGINT)
             AS bdays,
           (isodow(ship_d) <= 5 AND NOT list_contains($holidayListSql, ship_d))
             AS ship_is_bday
    FROM base ORDER BY l_orderkey, l_linenumber"""
  }

  // ------------------------------------------------------------------- q21
  // Forward rates from zero rates over a synthetic multi-curve
  // (curve = per-returnflag discount term structure).
  private def curveDf(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag").as("grp"),
        col("l_quantity").cast("long").as("du"))
      .agg(round(avg(col("l_discount")), 6).as("tx"))

  private val curveSqlCte = """
    curve AS (
      SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS du,
             round(avg(l_discount), 6) AS tx
      FROM lineitem GROUP BY 1, 2)"""

  private val q21: Q = (s, d) => {
    val c = curveDf(s, d)
    c.withColumn("fwd",
        round(Curve.forwards(col("du"), col("tx"), col("grp")), 8))
      .orderBy(col("grp"), col("du"))
  }

  private val q21Sql = s"""
    WITH $curveSqlCte,
    w AS (
      SELECT grp, du, tx,
             du / 252.0 AS au,
             lag(tx) OVER (PARTITION BY grp ORDER BY du) AS tx_j,
             lag(du / 252.0) OVER (PARTITION BY grp ORDER BY du) AS au_j,
             min(du) OVER (PARTITION BY grp) AS du_min
      FROM curve)
    SELECT grp, du, tx,
           round(CASE WHEN du = du_min THEN tx
                 ELSE pow(pow(tx + 1, au) / pow(tx_j + 1, au_j),
                          1.0 / (au - au_j)) - 1 END, 8) AS fwd
    FROM w ORDER BY grp, du"""

  // ------------------------------------------------------------------- q22
  // Vectorized multi-curve flat-forward interpolation (the reference's
  // flagship pipeline, interpolador.py:306-497) — targets drawn from orders.
  private val q22: Q = (s, d) => {
    val targets = orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", "A")
          .when(col("o_orderstatus") === "O", "N")
          .otherwise("R").as("grp"),
        (col("o_orderkey") % 70 + 1).as("du_alvo"))
    Curve.interpolate(targets, "du_alvo", curveDf(s, d), "du", "tx",
        groupT = Seq("grp"), groupC = Seq("grp"),
        extrapolate = false, outCol = "taxa")
      .withColumn("taxa", round(col("taxa"), 8))
      .orderBy(col("o_orderkey"))
  }

  private val q22Sql = s"""
    WITH $curveSqlCte,
    targets AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'F' THEN 'A'
                  WHEN o_orderstatus = 'O' THEN 'N'
                  ELSE 'R' END AS grp,
             o_orderkey % 70 + 1 AS du_alvo
      FROM orders),
    t1 AS (
      SELECT t.*,
        (SELECT max(du) FROM curve c WHERE c.grp = t.grp AND c.du <= t.du_alvo) AS du_j,
        (SELECT min(du) FROM curve c WHERE c.grp = t.grp AND c.du >= t.du_alvo) AS du_k,
        (SELECT min(du) FROM curve c WHERE c.grp = t.grp) AS du_min,
        (SELECT max(du) FROM curve c WHERE c.grp = t.grp) AS du_max
      FROM targets t),
    t2 AS (
      SELECT t1.*,
        (SELECT tx FROM curve c WHERE c.grp = t1.grp AND c.du = t1.du_j) AS tx_j,
        (SELECT tx FROM curve c WHERE c.grp = t1.grp AND c.du = t1.du_k) AS tx_k,
        (SELECT tx FROM curve c WHERE c.grp = t1.grp AND c.du = t1.du_min) AS tx_min
      FROM t1)
    SELECT o_orderkey, grp, du_alvo,
           round(CASE
             WHEN du_alvo IS NULL OR du_min IS NULL THEN NULL
             WHEN du_j = du_alvo THEN tx_j
             WHEN du_alvo < du_min THEN tx_min
             WHEN du_alvo > du_max THEN NULL
             ELSE pow(pow(tx_j + 1, du_j / 252.0)
                      * pow(pow(tx_k + 1, du_k / 252.0)
                            / pow(tx_j + 1, du_j / 252.0),
                            (du_alvo / 252.0 - du_j / 252.0)
                            / (du_k / 252.0 - du_j / 252.0)),
                      1.0 / (du_alvo / 252.0)) - 1
           END, 8) AS taxa
    FROM t2 ORDER BY o_orderkey"""

  val queries: Map[String, Q] = Map(
    "q20_business_days" -> q20,
    "q21_forward_rates" -> q21,
    "q22_interpolate_multicurve" -> q22)

  val oracleSql: Map[String, String] = Map(
    "q20_business_days" -> q20Sql,
    "q21_forward_rates" -> q21Sql,
    "q22_interpolate_multicurve" -> q22Sql)
}
