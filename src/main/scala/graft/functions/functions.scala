package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.functions._
import graft.core.{AddBusinessDays, BusinessDayCount, IsBusinessDay, RoundHalfEvenBinary, TruncateDecimal}

/** Column-expression surface of the engine — the Spark analogue of the
  * reference's `*_expr` family (pl.Expr factories). Every function returns a
  * codegen-friendly `Column`; none are Scala UDFs.
  */
object functions {

  /** Registers the custom Catalyst expressions for SQL use
    * (`SELECT bday_count(a, b) FROM ...`), mirroring how a
    * SparkSessionExtensions-based deployment would inject them.
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.core._
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bday_count",
      es => BusinessDayCount(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("is_bday",
      es => IsBusinessDay(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("add_bdays",
      es => AddBusinessDays(es.head, es(1), rollForward = true), "scala_udf")
    reg.createOrReplaceTempFunction("truncate_dec",
      es => TruncateDecimal(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("round_even",
      es => RoundHalfEvenBinary(es.head, es(1)), "scala_udf")
  }

  // ---------------------------------------------------------------- calendar

  /** Business days in [start, end) with Brazilian holidays, per-row dual
    * regime; negative when start > end.
    * Mirrors du.contar_expr (/root/reference/pyield/du/core.py:28-86).
    */
  def bday_count(start: Column, end: Column): Column =
    column(BusinessDayCount(expression(start.cast("date")),
                            expression(end.cast("date"))))

  /** Roll non-business dates in `rolagem` direction, then add n business
    * days. Mirrors du.deslocar_expr (/root/reference/pyield/du/core.py:223-281).
    */
  def bday_add(date: Column, n: Column, rollForward: Boolean = true): Column =
    column(AddBusinessDays(expression(date.cast("date")),
                           expression(n.cast("int")), rollForward))

  /** Weekday and not a holiday of the date's own regime.
    * Mirrors du.eh_dia_util_expr (/root/reference/pyield/du/core.py:559-600).
    */
  def is_bday(date: Column): Column =
    column(IsBusinessDay(expression(date.cast("date"))))

  /** Business days in [start, end] as an array column — the Column form of
    * du.gerar (sequence + filter on the business-day predicate; reference
    * pyield/du/core.py:499-556 maps a date_range the same way).
    */
  def bday_range(start: Column, end: Column): Column =
    filter(sequence(start.cast("date"), end.cast("date")),
      d => is_bday(d))

  // --------------------------------------------------------------- numerics

  /** Truncation toward zero at `decimals` places on the shortest decimal
    * representation (STN convention; /root/reference/pyield/_internal/numbers.py).
    */
  def truncate(x: Column, decimals: Int): Column =
    column(TruncateDecimal(expression(x.cast("double")),
                           expression(lit(decimals))))

  /** Round-half-to-even on the exact binary double (Python/Polars round
    * semantics; Spark's round is HALF_UP on the shortest decimal repr).
    */
  def round_even(x: Column, decimals: Int): Column =
    column(RoundHalfEvenBinary(expression(x.cast("double")),
                               expression(lit(decimals))))

  /** Plain float truncation `sign(x)*floor(|x|*10^d)/10^d` computed with IEEE
    * double ops only — for oracle-checked relational queries where the DuckDB
    * side evaluates the identical expression (bit-for-bit reproducible in any
    * engine, unlike decimal-repr truncation).
    */
  def trunc_ieee(x: Column, decimals: Int): Column = {
    val p = math.pow(10.0, decimals)
    signum(x) * floor(abs(x) * lit(p)) / lit(p)
  }

  // ------------------------------------------------------------- BR numbers
  // Reference: /root/reference/pyield/_internal/br_numbers.py:10-53

  /** "1.234,56" → 1234.56 (drop '.' thousands separators, ',' → '.').
    * try_cast: unparseable/empty strings are null, not ANSI errors.
    */
  def float_br(c: Column): Column =
    regexp_replace(regexp_replace(trim(c), "\\.", ""), ",", ".")
      .try_cast("double")

  /** BR percent string → decimal rate, rounded (Polars ties-even
    * semantics) to 10 places.
    */
  def taxa_br(c: Column): Column = round_even(float_br(c) / lit(100), 10)

  /** Percent number → decimal rate, rounded to 10 places
    * (pct_para_decimal, br_numbers.py:10-16).
    */
  def pct_para_decimal(c: Column): Column = round_even(c / lit(100), 10)

  /** BR-formatted number → integer: parse as float, round ties-even at 0
    * places, cast (br_numbers.py:43-49 — "406.559,43" → 406559).
    */
  def inteiro_br(c: Column): Column =
    round_even(float_br(c), 0).try_cast("long")

  /** BR number in thousands → integer units (br_numbers.py:52-54). */
  def inteiro_m(c: Column): Column =
    round_even(float_br(c) * 1000, 0).try_cast("long")

  // ----------------------------------------------------------- date parsing

  /** Tolerant multi-format date parsing: DD-MM-YYYY, DD/MM/YYYY, YYYY-MM-DD;
    * unparseable → null (reference converters.py:51-64).
    */
  def parse_date_br(c: Column): Column =
    coalesce(
      try_to_date(c, "dd-MM-yyyy"),
      try_to_date(c, "dd/MM/yyyy"),
      try_to_date(c, "yyyy-MM-dd"))
}
