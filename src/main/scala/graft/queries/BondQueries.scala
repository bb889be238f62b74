package graft.queries

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bonds.BondColumns
import graft.core.BrCalendar
import graft.functions._

/** Bond-pricing operator coverage over the driver testdata.
  *
  * q23/q25 use IEEE-only arithmetic (floor-truncation, plain pow) so DuckDB
  * reproduces them exactly; the STN-exact decimal chains (shortest-repr
  * truncation, half-even PV rounding) are NOT SQL-expressible and are
  * covered instead by BondsSpec goldens + the rows-only q24.
  */
object BondQueries {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // shared generators (OracleSql); [1994, 2031) window — q25 maturities
  // reach ~2030
  private lazy val holidayListSql: String = OracleSql.holidayListSql(1994, 2031)
  private def bdaysSql(a: String, b: String): String =
    OracleSql.bdaysSql(holidayListSql, a, b)

  // ------------------------------------------------------------------- q23
  // Zero-coupon (LTN-shaped) pricing curve: calendar + pow + IEEE trunc.
  private val q23: Q = (s, d) =>
    orders(s, d)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("liq"))
      .withColumn("venc", add_months(col("liq"), (col("o_orderkey") % 60 + 12).cast("int")))
      .withColumn("taxa", (col("o_orderkey") % 120).cast("double") / 1000 + lit(0.02))
      .withColumn("du", bday_count(col("liq"), col("venc")))
      .withColumn("anos", trunc_ieee(col("du").cast("double") / 252, 14))
      .withColumn("pu", round(lit(1000.0) / pow(col("taxa") + 1, col("anos")), 4))
      .orderBy(col("o_orderkey"))

  private lazy val q23Sql = s"""
    WITH base AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS liq,
             CAST(CAST(o_orderdate AS DATE)
               + to_months(CAST(o_orderkey % 60 + 12 AS INTEGER)) AS DATE) AS venc,
             CAST(o_orderkey % 120 AS DOUBLE) / 1000 + 0.02 AS taxa
      FROM orders),
    du AS (
      SELECT *, CAST(${bdaysSql("liq", "venc")} AS BIGINT) AS du FROM base)
    SELECT o_orderkey, liq, venc, taxa, du,
           sign(CAST(du AS DOUBLE) / 252)
             * floor(abs(CAST(du AS DOUBLE) / 252) * 100000000000000.0)
             / 100000000000000.0 AS anos,
           round(1000.0 / pow(taxa + 1,
             sign(CAST(du AS DOUBLE) / 252)
               * floor(abs(CAST(du AS DOUBLE) / 252) * 100000000000000.0)
               / 100000000000000.0), 4) AS pu
    FROM du ORDER BY o_orderkey"""

  // ------------------------------------------------------------------- q24
  // STN-exact pricing via the scalar operators. The oracle mirrors the
  // full decimal chains bit-for-bit: shortest-repr truncation via string
  // surgery on CAST(DOUBLE AS VARCHAR) (OracleSql.truncSrSql), the Polars
  // ties-even PV rounding via an explicit rint emulation (rint12Sql), the
  // +1bp half-even rate bump via exact DECIMAL(18,8) addition, and the
  // ascending-date flow sums via list_reduce (a left fold — SUM/window
  // SUM would not reproduce Scala's sequential fold bit-exactly).
  private val q24: Q = (s, d) =>
    orders(s, d)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("liq"))
      .withColumn("venc", // day-1 maturity: real NTN maturities are day 1/15,
        // and the schedule generator is (like the reference) strict about
        // invalid month-day combinations when stepping back 6 months
        add_months(trunc(col("liq"), "mon"), ((col("o_orderkey") % 40 + 2) * 6).cast("int")))
      .withColumn("taxa", (col("o_orderkey") % 100).cast("double") / 1000 + lit(0.03))
      .withColumn("ltn_pu", BondColumns.ltn_pu(col("liq"), col("venc"), col("taxa")))
      .withColumn("ntnb_cot", BondColumns.ntnb_cotacao(col("liq"), col("venc"), col("taxa")))
      .withColumn("ntnb_pu", BondColumns.ntnb_pu(lit(4000.0), col("ntnb_cot")))
      .withColumn("ntnb_dur", BondColumns.ntnb_duration(col("liq"), col("venc"), col("taxa")))
      .withColumn("ntnb_dv01", BondColumns.ntnb_dv01(col("liq"), col("venc"), col("taxa"), col("ntnb_pu")))
      .withColumn("lft_cot", BondColumns.lft_cotacao(col("liq"), col("venc"), col("taxa") / 100))
      .orderBy(col("o_orderkey"))

  private lazy val q24Sql = {
    import OracleSql.{rint12Sql, truncSrSql}
    s"""
    WITH base AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS liq,
             CAST(date_trunc('month', CAST(o_orderdate AS DATE))
               + to_months(CAST((o_orderkey % 40 + 2) * 6 AS INTEGER)) AS DATE) AS venc,
             CAST(o_orderkey % 100 AS DOUBLE) / 1000 + 0.03 AS taxa
      FROM orders WHERE o_orderkey % 10 = 0),
    rates AS (
      SELECT *, ${truncSrSql("taxa", 8)} AS t,
             ${truncSrSql("taxa / 100", 8)} AS t_lft
      FROM base),
    -- t1 = roundHalfEven(t + 1bp, 8): t is (the double nearest) an <=8dp
    -- decimal, so the exact DECIMAL(18,8) sum rounds identically to
    -- Java's new BigDecimal(t + 1e-4).setScale(8, HALF_EVEN)
    rates2 AS (
      SELECT *, ${truncSrSql(
        "CAST(CAST(t AS DECIMAL(18,8)) + CAST(0.0001 AS DECIMAL(18,8)) AS DOUBLE)", 8)} AS t1
      FROM rates),
    duv AS (
      SELECT *, CAST(${bdaysSql("liq", "venc")} AS BIGINT) AS du_v FROM rates2),
    anosv AS (
      SELECT *, ${truncSrSql("CAST(du_v AS DOUBLE) / 252", 14)} AS anos_v FROM duv),
    scal AS (
      SELECT o_orderkey,
             ${truncSrSql("1000.0 / pow(1.0 + t, anos_v)", 6)} AS ltn_pu,
             ${truncSrSql("1.0 / pow(1.0 + t_lft, anos_v)", 6)} AS lft_cot
      FROM anosv),
    flows AS (
      SELECT r.o_orderkey, r.liq, r.taxa, r.t, r.t1,
             CAST(r.venc - to_months(CAST(i * 6 AS INTEGER)) AS DATE) AS flow_d,
             CASE WHEN i = 0 THEN 1.02956301 ELSE 0.02956301 END AS cf
      FROM rates2 r CROSS JOIN range(0, 62) tt(i)
      WHERE CAST(r.venc - to_months(CAST(i * 6 AS INTEGER)) AS DATE) > r.liq),
    fdu AS (
      SELECT *, CAST(${bdaysSql("liq", "flow_d")} AS BIGINT) AS du FROM flows),
    fanos AS (
      SELECT *, ${truncSrSql("CAST(du AS DOUBLE) / 252", 14)} AS anos_t,
             CAST(du AS DOUBLE) / 252 AS anos_raw
      FROM fdu),
    fterm AS (
      SELECT o_orderkey, flow_d,
             ${rint12Sql("cf / pow(1.0 + t, anos_t)")} AS pv_t,
             ${rint12Sql("cf / pow(1.0 + t1, anos_t)")} AS pv_t1,
             cf / pow(1.0 + taxa, anos_raw) AS vp_raw,
             (cf / pow(1.0 + taxa, anos_raw)) * anos_raw AS vpa_raw
      FROM fanos),
    aggs AS (
      SELECT o_orderkey,
             ${truncSrSql("list_reduce(list(pv_t ORDER BY flow_d), (a, b) -> a + b)", 6)} AS ntnb_cot,
             ${truncSrSql("list_reduce(list(pv_t1 ORDER BY flow_d), (a, b) -> a + b)", 6)} AS cot2,
             ${truncSrSql("list_reduce(list(vpa_raw ORDER BY flow_d), (a, b) -> a + b)" +
               " / list_reduce(list(vp_raw ORDER BY flow_d), (a, b) -> a + b)", 14)} AS ntnb_dur
      FROM fterm GROUP BY o_orderkey),
    pu AS (
      SELECT *, ${truncSrSql(s"4000.0 * ${truncSrSql("ntnb_cot", 6)}", 6)} AS ntnb_pu
      FROM aggs)
    SELECT b.o_orderkey, b.liq, b.venc, b.taxa,
           s.ltn_pu, p.ntnb_cot, p.ntnb_pu, p.ntnb_dur,
           p.ntnb_pu * (1 - p.cot2 / p.ntnb_cot) AS ntnb_dv01,
           s.lft_cot
    FROM base b JOIN scal s ON s.o_orderkey = b.o_orderkey
                JOIN pu p ON p.o_orderkey = b.o_orderkey
    ORDER BY b.o_orderkey"""
  }

  // ------------------------------------------------------------------- q25
  // Coupon-bond PV: semiannual flow schedule (explode) + business-day
  // discounting, fully SQL-mirrored.
  private val q25: Q = (s, d) =>
    part(s, d)
      .select(col("p_partkey"))
      .withColumn("liq", date_add(lit("1995-01-01").cast("date"),
        (col("p_partkey") % 1000).cast("int")))
      .withColumn("venc", add_months(col("liq"), ((col("p_partkey") % 30 + 2) * 6).cast("int")))
      .withColumn("taxa", (col("p_partkey") % 100).cast("double") / 1000 + lit(0.03))
      .withColumn("i", explode(sequence(lit(0), lit(61))))
      .withColumn("flow_d", add_months(col("venc"), -(col("i") * 6).cast("int")))
      .filter(col("flow_d") > col("liq"))
      .withColumn("cf", when(col("i") === 0, lit(1048.80885)).otherwise(lit(48.80885)))
      .withColumn("du", bday_count(col("liq"), col("flow_d")))
      .withColumn("pv", col("cf") / pow(col("taxa") + 1, col("du").cast("double") / 252))
      .groupBy(col("p_partkey"), col("liq"), col("venc"), col("taxa"))
      .agg(count(lit(1)).as("n_flows"), round(sum(col("pv")), 4).as("pv_total"))
      .orderBy(col("p_partkey"))

  private lazy val q25Sql = s"""
    WITH base AS (
      SELECT p_partkey,
             DATE '1995-01-01' + CAST(p_partkey % 1000 AS INTEGER) AS liq,
             CAST(DATE '1995-01-01' + CAST(p_partkey % 1000 AS INTEGER)
               + to_months(CAST((p_partkey % 30 + 2) * 6 AS INTEGER)) AS DATE) AS venc,
             CAST(p_partkey % 100 AS DOUBLE) / 1000 + 0.03 AS taxa
      FROM part),
    flows AS (
      SELECT b.*, CAST(b.venc - to_months(CAST(t.i * 6 AS INTEGER)) AS DATE) AS flow_d,
             CASE WHEN t.i = 0 THEN 1048.80885 ELSE 48.80885 END AS cf
      FROM base b CROSS JOIN range(0, 62) t(i)
      WHERE CAST(b.venc - to_months(CAST(t.i * 6 AS INTEGER)) AS DATE) > b.liq),
    pv AS (
      SELECT *, cf / pow(taxa + 1,
        CAST(${bdaysSql("liq", "flow_d")} AS DOUBLE) / 252) AS pv
      FROM flows)
    SELECT p_partkey, liq, venc, taxa,
           count(*) AS n_flows, round(sum(pv), 4) AS pv_total
    FROM pv GROUP BY p_partkey, liq, venc, taxa
    ORDER BY p_partkey"""

  val queries: Map[String, Q] = Map(
    "q23_zero_coupon_curve" -> q23,
    "q24_stn_pricing" -> q24,
    "q25_coupon_bond_pv" -> q25)

  val oracleSql: Map[String, String] = Map(
    "q23_zero_coupon_curve" -> q23Sql,
    "q24_stn_pricing" -> q24Sql,
    "q25_coupon_bond_pv" -> q25Sql)
}
