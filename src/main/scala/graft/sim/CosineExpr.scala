package graft.sim

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two float- or double-array embeddings as ONE
  * native pass — the fused form of the `zip_with`+`aggregate` lambda
  * chain in [[Similarity.cosineHof]] (kept as the semantic cross-check
  * twin).
  *
  * Arithmetic is IDENTICAL to the HOF form and to the DuckDB oracle's
  * list_transform/list_sum: every float is widened to double (exact), the
  * three folds (dot, |a|², |b|²) accumulate sequentially left-to-right,
  * and the result is dot / (sqrt(na) * sqrt(nb)) — so the IEEE result is
  * bit-identical while skipping the interpreted per-element lambda boxing
  * (HOF lambdas evaluate via per-element `InterpretedProjection`; at
  * corpus scale the arithmetic, not the plan, was the entire q35 cost).
  * The two sides may mix element types (e.g. a FLOAT embedding against a
  * DOUBLE centroid): each slot is read at its declared width, then the
  * fold runs entirely in double.
  *
  * Null contract mirrors the HOF chain: a null array (BinaryExpression
  * default), a null element anywhere, or a length mismatch (zip_with pads
  * the shorter side with nulls) each null out the fold, hence the result.
  * A zero-norm (or empty) vector yields NULL — the DuckDB oracle's
  * divide-by-zero semantics and the ranking pipeline's documented
  * null-score contract ([[Similarity.finishTopK]] filters null sims);
  * the HOF twin instead throws DIVIDE_BY_ZERO under ANSI mode, which is
  * exactly the production hazard this expression removes.
  */
case class DotCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_cosine"
  // the fold can null out mid-array (null element, length mismatch,
  // zero norm) even when both inputs are non-null
  override def nullable: Boolean = true

  // Strict array<float|double> gate (ExpectsInputTypes is unusable here:
  // AbstractDataType is private[sql]): eval reads each slot at the side's
  // declared width; on any OTHER element type an unsafe-array read would
  // reinterpret raw bytes and return silently wrong similarities — misuse
  // must fail at analysis time, not produce garbage.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @transient private lazy val leftIsDouble =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  @transient private lazy val rightIsDouble =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotCosine.cosineBoxed(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], leftIsDouble, rightIsDouble)

  // Codegen'd (r12, guide rule 4): as a CodegenFallback this forced the
  // surrounding whole-stage-codegen stage to materialize its full input
  // row per CALL (both embedding arrays copied per candidate pair — the
  // SortedArraysJaccard defect, same fix). The helper returns a boxed
  // Double because the fold can null out; one box per call replaces one
  // row buffer per call.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosRes")
      s"""
         |java.lang.Double $tmp = graft.sim.DotCosine$$.MODULE$$.cosineBoxed(
         |  $a, $b, $leftIsDouble, $rightIsDouble);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotCosine =
    copy(left = newLeft, right = newRight)
}

object DotCosine {
  /** The cosine fold shared by interpreted eval and generated code —
    * boxed so the null contract (null element, length mismatch, zero
    * norm → null) survives both paths.
    */
  def cosineBoxed(va: ArrayData, vb: ArrayData, leftIsDouble: Boolean,
                  rightIsDouble: Boolean): java.lang.Double = {
    val n = va.numElements()
    if (vb.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (va.isNullAt(i) || vb.isNullAt(i)) return null
      val x = if (leftIsDouble) va.getDouble(i) else va.getFloat(i).toDouble
      val y = if (rightIsDouble) vb.getDouble(i) else vb.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }
}

/** Raw dot product of two float- or double-array vectors as one native
  * pass — the unnormalized sibling of [[DotCosine]] (same widening, same
  * sequential left-to-right fold, so it is bit-identical to the
  * `zip_with`+`aggregate` HOF form in [[Similarity.dot]] and to the
  * DuckDB list_transform/list_sum mirror). Powers the per-row matvec of
  * the q117 distributed power iteration, where the interpreted HOF
  * lambda was the entire iteration cost. Null contract as [[DotCosine]]:
  * null array, null element, or length mismatch → NULL; a zero vector is
  * a legitimate 0.0 here (no normalization to divide by).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // null element / length mismatch null the fold out (DotCosine rule)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @transient private lazy val leftIsDouble =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  @transient private lazy val rightIsDouble =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dotBoxed(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], leftIsDouble, rightIsDouble)

  // Codegen'd (r12): same rationale and shape as [[DotCosine.doGenCode]]
  // — this powers q117's per-row matvec, where a fallback re-built the
  // row (64-element array copy) once per row per power iteration.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.sim.DotProduct$$.MODULE$$.dotBoxed(
         |  $a, $b, $leftIsDouble, $rightIsDouble);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** The dot fold shared by interpreted eval and generated code. */
  def dotBoxed(va: ArrayData, vb: ArrayData, leftIsDouble: Boolean,
               rightIsDouble: Boolean): java.lang.Double = {
    val n = va.numElements()
    if (vb.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (va.isNullAt(i) || vb.isNullAt(i)) return null
      val x = if (leftIsDouble) va.getDouble(i) else va.getFloat(i).toDouble
      val y = if (rightIsDouble) vb.getDouble(i) else vb.getFloat(i).toDouble
      dot += x * y
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }
}
