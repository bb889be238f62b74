package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{AsOf, Dedup}

/** Relational operator coverage (SURVEY.md §2.2-§2.7) expressed over the
  * driver testdata, each with an exact DuckDB oracle.
  *
  * Determinism rules used throughout (so Spark and DuckDB hash-match):
  *   - every query ORDER BYs a unique key set;
  *   - per-row arithmetic (+,-,*,/) is IEEE-identical across engines and is
  *     left unrounded; commutative AGGREGATES of doubles are rounded (the
  *     summation order differs between engines) — rounding decimals chosen
  *     so the fp error is orders of magnitude below the rounding step;
  *   - pow/exp/log results are rounded (libm last-ulp differences).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // q01 — grouped aggregation (pricing summary, SURVEY §2.4)
  private val q01: Q = (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql = """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  // q02 — filter + projection with derived per-row arithmetic (§2.2)
  private val q02: Q = (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.02, 0.06))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        col("l_shipdate").cast("date").as("ship_d"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q02Sql = """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           CAST(l_shipdate AS DATE) AS ship_d
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
    ORDER BY l_orderkey, l_linenumber"""

  // q03 — multi-way equi join (broadcast dims) + aggregation (§2.3)
  private val q03: Q = (s, d) =>
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))

  private val q03Sql = """
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name ORDER BY r_name, n_name"""

  // q04 — left-semi join (EXISTS; §2.3)
  private val q04: Q = (s, d) =>
    orders(s, d)
      .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  private val q04Sql = """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    ORDER BY o_orderkey"""

  // q05 — left-anti join (NOT EXISTS; §2.3)
  private val q05: Q = (s, d) =>
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  private val q05Sql = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey"""

  // q06 — when/then/otherwise cascade (§2.2) feeding an aggregate
  private val q06: Q = (s, d) =>
    orders(s, d)
      .withColumn("band",
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 200000, "mid")
          .when(col("o_totalprice") < 400000, "high")
          .otherwise("jumbo"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("band"))

  private val q06Sql = """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 200000 THEN 'mid'
                WHEN o_totalprice < 400000 THEN 'high'
                ELSE 'jumbo' END AS band,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY 1 ORDER BY band"""

  // q07 — lag window (§2.5: shift(1).over)
  private val q07: Q = (s, d) => {
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_d"))
      .withColumn("prev_d",
        lag(col("order_d"), 1).over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("order_d"), col("o_orderkey"))))
      .withColumn("gap_days", datediff(col("order_d"), col("prev_d")))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q07Sql = """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_d,
           lag(CAST(o_orderdate AS DATE), 1) OVER
             (PARTITION BY o_custkey
              ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_d,
           date_diff('day',
             lag(CAST(o_orderdate AS DATE), 1) OVER
               (PARTITION BY o_custkey
                ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
             CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders ORDER BY o_custkey, o_orderkey"""

  // q08 — ordered running sum (§2.5: cum_sum().over) — sequential frame
  // evaluation is order-identical in both engines, so no rounding needed.
  private val q08: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("order_d"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_d"), col("o_totalprice"))
      .withColumn("cum_spend", round(sum(col("o_totalprice")).over(w), 2))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q08Sql = """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_d,
           o_totalprice,
           round(sum(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
    FROM orders ORDER BY o_custkey, o_orderkey"""

  // q09 — dense_rank over an aggregate (§2.5)
  private val q09: Q = (s, d) =>
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("c_acctbal")), 2).as("total_bal"))
      .withColumn("rnk", dense_rank().over(Window.orderBy(col("total_bal").desc)))
      .orderBy(col("rnk"), col("n_name"))

  private val q09Sql = """
    WITH t AS (SELECT n_name, round(sum(c_acctbal), 2) AS total_bal
               FROM customer JOIN nation ON c_nationkey = n_nationkey
               GROUP BY n_name)
    SELECT n_name, total_bal,
           dense_rank() OVER (ORDER BY total_bal DESC) AS rnk
    FROM t ORDER BY rnk, n_name"""

  // q10 — deterministic keep-last dedup (§2.4: unique(keep="last"))
  private val q10: Q = (s, d) =>
    Dedup.keepLast(orders(s, d), Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("last_order_d"))
      .orderBy(col("o_custkey"))

  private val q10Sql = """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_order_d
    FROM (SELECT *, row_number() OVER
            (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1 ORDER BY o_custkey"""

  // q11 — diagonal union: unionByName with schema fill (§2.6)
  private val q11: Q = (s, d) => {
    val a = orders(s, d).select(
      col("o_orderkey").as("id"), lit("order").as("src"),
      col("o_totalprice").as("amount"))
    val b = lineitem(s, d).select(
      col("l_orderkey").as("id"), lit("lineitem").as("src"),
      col("l_extendedprice").as("amount"),
      col("l_linenumber").as("line_no"))
    a.unionByName(b, allowMissingColumns = true)
      .orderBy(col("src"), col("id"), col("line_no").asc_nulls_first)
  }

  private val q11Sql = """
    SELECT * FROM (
      SELECT o_orderkey AS id, 'order' AS src, o_totalprice AS amount,
             CAST(NULL AS INTEGER) AS line_no FROM orders
      UNION ALL BY NAME
      SELECT l_orderkey AS id, 'lineitem' AS src, l_extendedprice AS amount,
             l_linenumber AS line_no FROM lineitem)
    ORDER BY src, id, line_no NULLS FIRST"""

  // q12 — as-of join BACKWARD with by-group (§2.3, the load-bearing
  // primitive): for each purchase, the user's last click at-or-before it.
  private val q12: Q = (s, d) => {
    val ev = eventsMicros(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
    // one click row per (user, ts), keeping the max value: equal-timestamp
    // duplicates would otherwise make BOTH engines pick an arbitrary tie
    // row and the hash gate flake
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us").as("c_ts"))
      .agg(max(col("value")).as("c_value"))
    AsOf.join(purchases, clicks, by = Seq("user_id"),
        leftOn = "ts_us", rightOn = "c_ts",
        payload = Seq("c_ts" -> "click_ts_us", "c_value" -> "click_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val q12Sql = """
    SELECT p.user_id, p.event_id, epoch_us(p.ts) AS ts_us, p.value,
           (SELECT epoch_us(max(c.ts)) FROM events c
            WHERE c.event_type = 'click' AND c.user_id = p.user_id
              AND c.ts <= p.ts) AS click_ts_us,
           (SELECT max(c.value) FROM events c
            WHERE c.event_type = 'click' AND c.user_id = p.user_id
              AND c.ts = (SELECT max(c2.ts) FROM events c2
                          WHERE c2.event_type = 'click'
                            AND c2.user_id = p.user_id
                            AND c2.ts <= p.ts)) AS click_value
    FROM events p WHERE p.event_type = 'purchase'
    ORDER BY p.user_id, p.event_id"""

  // q13 — as-of join FORWARD: for each signup, the user's first purchase
  // at-or-after it.
  private val q13: Q = (s, d) => {
    val ev = eventsMicros(s, d)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    // dedup equal timestamps deterministically (see q12)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us").as("p_ts"))
      .agg(max(col("value")).as("p_value"))
    AsOf.join(signups, purchases, by = Seq("user_id"),
        leftOn = "ts_us", rightOn = "p_ts",
        payload = Seq("p_ts" -> "purchase_ts_us", "p_value" -> "purchase_value"),
        forward = true)
      .orderBy(col("user_id"), col("event_id"))
  }

  private val q13Sql = """
    SELECT g.user_id, g.event_id, epoch_us(g.ts) AS ts_us,
           (SELECT epoch_us(min(p.ts)) FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = g.user_id
              AND p.ts >= g.ts) AS purchase_ts_us,
           (SELECT max(p.value) FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = g.user_id
              AND p.ts = (SELECT min(p2.ts) FROM events p2
                          WHERE p2.event_type = 'purchase'
                            AND p2.user_id = g.user_id
                            AND p2.ts >= g.ts)) AS purchase_value
    FROM events g WHERE g.event_type = 'signup'
    ORDER BY g.user_id, g.event_id"""

  // q14 — distinct + sort of one column (§2.4 unique().sort())
  private val q14: Q = (s, d) =>
    orders(s, d).select(col("o_orderpriority")).distinct()
      .orderBy(col("o_orderpriority"))

  private val q14Sql =
    "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority"

  // q15 — string functions (§2.7)
  private val q15: Q = (s, d) =>
    part(s, d)
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_pfx"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_u"),
        col("p_brand").startsWith("Brand#1").as("is_brand1"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        trim(upper(col("p_type"))).as("type_uc"))
      .filter(length(col("p_name")) > 5)
      .orderBy(col("p_partkey"))

  private val q15Sql = """
    SELECT p_partkey,
           upper(substr(p_name, 1, 8)) AS name_pfx,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_u,
           starts_with(p_brand, 'Brand#1') AS is_brand1,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
           trim(upper(p_type)) AS type_uc
    FROM part WHERE length(p_name) > 5 ORDER BY p_partkey"""

  // q16 — date functions (§2.7)
  private val q16: Q = (s, d) =>
    orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("order_d"))
      .withColumn("y", year(col("order_d")))
      .withColumn("m", month(col("order_d")))
      .withColumn("month_start", trunc(col("order_d"), "mon"))
      .withColumn("days_to_y2k",
        datediff(lit("2000-01-01").cast("date"), col("order_d")))
      .withColumn("plus3m", add_months(col("order_d"), 3))
      .orderBy(col("o_orderkey"))

  private val q16Sql = """
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_d,
           year(CAST(o_orderdate AS DATE)) AS y,
           month(CAST(o_orderdate AS DATE)) AS m,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
             AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
    FROM orders ORDER BY o_orderkey"""

  // q17 — horizontal sum with null handling (§2.4) + IEEE truncation (§2.7)
  private val q17: Q = (s, d) => {
    import graft.functions.trunc_ieee
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        (coalesce(col("l_tax"), lit(0.0)) +
          coalesce(col("l_discount"), lit(0.0))).as("charges"),
        trunc_ieee(col("l_extendedprice") * col("l_discount"), 4)
          .as("disc_amt_trunc"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val q17Sql = """
    SELECT l_orderkey, l_linenumber,
           coalesce(l_tax, 0.0) + coalesce(l_discount, 0.0) AS charges,
           sign(l_extendedprice * l_discount)
             * floor(abs(l_extendedprice * l_discount) * 10000.0) / 10000.0
             AS disc_amt_trunc
    FROM lineitem ORDER BY l_orderkey, l_linenumber"""

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01,
    "q02_filter_project" -> q02,
    "q03_join_agg" -> q03,
    "q04_semi_join" -> q04,
    "q05_anti_join" -> q05,
    "q06_case_bands" -> q06,
    "q07_window_lag" -> q07,
    "q08_window_cumsum" -> q08,
    "q09_dense_rank" -> q09,
    "q10_dedup_keeplast" -> q10,
    "q11_union_byname" -> q11,
    "q12_asof_backward" -> q12,
    "q13_asof_forward" -> q13,
    "q14_distinct_sort" -> q14,
    "q15_string_ops" -> q15,
    "q16_date_ops" -> q16,
    "q17_horizontal_sum" -> q17)

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_join_agg" -> q03Sql,
    "q04_semi_join" -> q04Sql,
    "q05_anti_join" -> q05Sql,
    "q06_case_bands" -> q06Sql,
    "q07_window_lag" -> q07Sql,
    "q08_window_cumsum" -> q08Sql,
    "q09_dense_rank" -> q09Sql,
    "q10_dedup_keeplast" -> q10Sql,
    "q11_union_byname" -> q11Sql,
    "q12_asof_backward" -> q12Sql,
    "q13_asof_forward" -> q13Sql,
    "q14_distinct_sort" -> q14Sql,
    "q15_string_ops" -> q15Sql,
    "q16_date_ops" -> q16Sql,
    "q17_horizontal_sum" -> q17Sql)
}
