package graft.core

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd Catalyst expressions for the Brazilian business-day calendar.
  *
  * These stay inside whole-stage codegen (no UDF boxing): each generated
  * snippet is a static call into [[BrCalendar]], whose holiday arrays are
  * JVM-local (shipped in the jar, loaded once per executor). Date operands
  * use Spark's internal epoch-day Int representation directly.
  *
  * Semantics mirror /root/reference/pyield/du/core.py (contar 89-220,
  * deslocar 318-496, eh_dia_util 605-679) including the per-row dual
  * holiday regime.
  */
case class BusinessDayCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bday_count"

  override protected def nullSafeEval(start: Any, end: Any): Any =
    BrCalendar.contar(start.asInstanceOf[Int], end.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, e) => s"graft.core.BrCalendar.contar($s, $e)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BusinessDayCount =
    copy(left = newLeft, right = newRight)
}

/** Roll `date` to a business day (direction `rollForward`), then add `n`
  * business days. `n` may be any integral column.
  */
case class AddBusinessDays(left: Expression, right: Expression,
                           rollForward: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = DateType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "add_bdays"

  override protected def nullSafeEval(date: Any, n: Any): Any =
    BrCalendar.deslocar(date.asInstanceOf[Int], n.asInstanceOf[Int], rollForward)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (d, n) => s"graft.core.BrCalendar.deslocar($d, $n, $rollForward)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AddBusinessDays =
    copy(left = newLeft, right = newRight)
}

/** True when the date is a weekday and not a holiday of its own regime. */
case class IsBusinessDay(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "is_bday"

  override protected def nullSafeEval(date: Any): Any =
    BrCalendar.ehDiaUtil(date.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.core.BrCalendar.ehDiaUtil($d)")

  override protected def withNewChildInternal(newChild: Expression): IsBusinessDay =
    copy(child = newChild)
}

/** Truncation toward zero at `decimals` places, matching the reference's
  * decimal-exact `truncar` (/root/reference/pyield/_internal/numbers.py:15-45):
  * the double is first read through its shortest decimal representation
  * (Double.toString), then truncated — so truncar(8.2, 3) == 8.2, not 8.199.
  * NaN passes through (the reference keeps NaN distinct from null).
  */
case class TruncateDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "truncate"

  override protected def nullSafeEval(x: Any, d: Any): Any =
    Num.truncar(x.asInstanceOf[Double], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, d) => s"graft.core.Num.truncar($x, $d)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TruncateDecimal =
    copy(left = newLeft, right = newRight)
}

/** Polars-style round: scale, rint (ties-to-even on the SCALED binary
  * value), unscale — Spark's own `round` is HALF_UP on the shortest
  * decimal representation and differs on values like x.xx5. NOTE: this is
  * NOT Python's round (exact-binary half-even on the unscaled value,
  * `Num.roundHalfEven`) — the two differ at tie-edge values like
  * 470198680.075; see Num.scala for the split.
  */
case class RoundHalfEvenBinary(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "round_even"

  override protected def nullSafeEval(x: Any, d: Any): Any =
    Num.roundPolars(x.asInstanceOf[Double], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, d) => s"graft.core.Num.roundPolars($x, $d)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RoundHalfEvenBinary =
    copy(left = newLeft, right = newRight)
}
