package graft.sim

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** 16-bit hyperplane-sign sketch of a float-array embedding as ONE native
  * pass — the fused form of the 16 `zip_with`+`aggregate` lambda chains in
  * [[Similarity.hyperplaneSketch16Hof]] (kept as the semantic cross-check
  * twin). The ±1 hyperplane components are the md5("j|i") parities the HOF
  * builds as column literals, precomputed here at construction.
  *
  * Arithmetic is IDENTICAL to the HOF form and the DuckDB oracle: each
  * float widens to double (exact) and each plane's dot product accumulates
  * sequentially over i — the i-major loop below keeps 16 independent
  * accumulators, which preserves each plane's left-to-right fold order
  * bit-for-bit while reading the vector once instead of 16 times.
  *
  * Result contract mirrors the HOF chain, which never returns null: a
  * null array, a null element, or a length mismatch each null out the
  * affected dot folds, and `when(dot > 0, bit).otherwise(0)` maps a null
  * dot to 0 — so all three degenerate cases yield sketch 0 (all bits
  * clear), as does the oracle's `CASE WHEN list_sum(...) > 0`.
  */
case class HyperplaneSketch16(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {

  require(dim >= 1, s"embedding dim must be >= 1, got $dim")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "hyperplane_sketch16"

  // strict array<float> gate — see DotCosine's note on unsafe getFloat
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT> argument, got ${other.simpleString}")
  }

  // signs(j)(i) = +1.0 when the high bit of md5("j|i")'s first hex digit
  // is set, else -1.0 — identical to the HOF plane literals and the
  // oracle's substr(md5(j || '|' || i), 1, 1) IN ('8'..'f') test.
  @transient private lazy val signs: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(16, dim) { (j, i) =>
      md.reset()
      val d = md.digest(s"$j|$i".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return 0
    val dots = new Array[Double](16)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return 0
      val x = arr.getFloat(i).toDouble
      var j = 0
      while (j < 16) {
        dots(j) += x * signs(j)(i)
        j += 1
      }
      i += 1
    }
    var sketch = 0
    var j = 0
    while (j < 16) {
      if (dots(j) > 0) sketch |= 1 << j
      j += 1
    }
    sketch
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneSketch16 = copy(child = newChild)
}
