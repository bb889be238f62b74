package graft.sim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-vector int8 scalar quantization as ONE native pass — the storage
  * operator of a large embedding corpus (a 100 TB float store quantizes
  * 4:1 before anything else touches it; search then runs on codes and
  * re-ranks on the float originals it kept for the survivors).
  *
  * Affine scheme, engine-reproducible arithmetic only:
  *   scale  = (max - min) / 255           (plain IEEE ops)
  *   code_i = clamp(floor((x_i - min) / scale + 0.5), 0, 255)
  *     — floor(y + 0.5) instead of a rounding mode so any engine
  *       reproduces the codes digit-for-digit (round-half-even vs
  *       half-up never enters);
  *   x'_i   = min + code_i * scale
  * A constant vector (scale = 0) maps every component to code 0 and
  * reconstructs exactly. The returned struct carries the codes and the
  * reconstruction quality a pipeline monitors:
  *   v_min, v_max     — the affine range (doubles, exact from floats)
  *   max_abs_err      — max_i |x_i - x'_i|
  *   sum_sq_err       — left-to-right fold of (x_i - x'_i)^2 (callers
  *                      divide by the dimension for MSE; the raw sum
  *                      keeps the fold order explicit)
  *   codes            — array<int> in [0, 255]
  *
  * Null contract mirrors the other vector expressions: null array → null
  * (UnaryExpression default), a null ELEMENT nulls the whole struct
  * (a partially-quantized vector is worse than none). A NON-FINITE
  * element (NaN/Inf) also nulls the struct: comparison-based min/max
  * would silently skip NaN and an Inf range degenerates every code to
  * 0 with max_abs_err reading 0.0 — a "perfect" reconstruction of an
  * infinitely wrong vector; failing to null would also diverge from the
  * oracle's list_min/list_max NaN semantics. An EMPTY array yields
  * nulls for the range/error fields and an empty codes array.
  */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = QuantizeInt8.schema
  override def prettyName: String = "quantize_int8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    // per-thread memo: projecting several struct fields from one
    // quantize_int8 call collapses into N copies of the expression in one
    // Project, and CodegenFallback gets no subexpression elimination —
    // same pattern (and rationale) as MinHashSig/TextStats. The key is
    // the materialized float array: eval inputs are views over reused
    // scan buffers, so the copy is the only sound identity.
    val floats = v.toFloatArray()
    val m = QuantizeInt8.memo.get()
    if (m.key != null && java.util.Arrays.equals(m.key, floats))
      return m.value
    var finite = true
    i = 0
    while (i < n) {
      if (!java.lang.Float.isFinite(floats(i))) finite = false
      i += 1
    }
    val result =
      if (!finite) null
      else if (n == 0)
        InternalRow(null, null, null, null,
          new GenericArrayData(Array.empty[Any]))
      else {
        var mn = Double.MaxValue
        var mx = Double.MinValue
        i = 0
        while (i < n) {
          val x = floats(i).toDouble
          if (x < mn) mn = x
          if (x > mx) mx = x
          i += 1
        }
        val scale = (mx - mn) / 255.0
        val codes = new Array[Any](n)
        var maxErr = 0.0
        var sumSq = 0.0
        i = 0
        while (i < n) {
          val x = floats(i).toDouble
          val c =
            if (scale == 0.0) 0
            else {
              val y = math.floor((x - mn) / scale + 0.5)
              if (y < 0.0) 0 else if (y > 255.0) 255 else y.toInt
            }
          codes(i) = c
          val err = math.abs(x - (mn + c * scale))
          if (err > maxErr) maxErr = err
          sumSq += (x - (mn + c * scale)) * (x - (mn + c * scale))
          i += 1
        }
        InternalRow(mn, mx, maxErr, sumSq, new GenericArrayData(codes))
      }
    m.key = floats
    m.value = result
    result
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  val schema: StructType = StructType(Seq(
    StructField("v_min", DoubleType),
    StructField("v_max", DoubleType),
    StructField("max_abs_err", DoubleType),
    StructField("sum_sq_err", DoubleType),
    StructField("codes", ArrayType(IntegerType, containsNull = false))))

  /** Shared across expression instances (Catalyst copies trees during
    * optimization); one slot per thread — same shape as the
    * MinHashSig/TextStats memos.
    */
  final class Memo {
    var key: Array[Float] = _
    var value: Any = _
  }
  private[sim] val memo: ThreadLocal[Memo] =
    ThreadLocal.withInitial[Memo](() => new Memo)
}
