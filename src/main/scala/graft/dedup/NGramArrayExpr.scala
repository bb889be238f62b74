package graft.dedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SORTED distinct word n-gram array of a text, as one native pass —
  * the per-DOCUMENT half of [[NGramJaccard]] factored out so that a
  * candidate-verify join can compute each document's gram set ONCE
  * (scan-local) instead of once per candidate pair. A document in a
  * near-dup corpus appears in many candidate pairs; recomputing
  * normalize→split→gram-set per pair made the verify stage the dominant
  * cost of the q50 clustering pipeline.
  *
  * Gram semantics are identical to [[NGramJaccard]] (and the DuckDB
  * oracle): slices w[i..i+n) for i in 0..max(L-n, 0), final slice
  * clamped, joined by one space, distinct. The output is sorted in
  * UTF8String binary order so [[SortedArraysJaccard]] can merge-count
  * the intersection in O(|A|+|B|) without building a hash set per pair.
  */
case class NGramArray(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_array"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.simpleString}")

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    val normalized = UTF8String.fromString(
      ws.matcher(raw.toLowerCase.toString).replaceAll(" ")).trim().toString
    val words = normalized.split(" ", -1)
    val out = new java.util.TreeSet[UTF8String]() // sorted + distinct
    val last = math.max(words.length - n, 0)
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, words.length)
      val sb = new StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size)))
  }

  override protected def withNewChildInternal(newChild: Expression): NGramArray =
    copy(child = newChild)
}

/** Jaccard similarity of two SORTED distinct string arrays (the
  * [[NGramArray]] output) by linear merge — per-pair cost is one pass of
  * UTF8String binary comparisons, no hashing and no per-pair set build.
  * Returns the raw ratio (0.0 when both sides are empty), identical to
  * [[NGramJaccard]]'s — callers apply Spark's round().
  */
case class SortedArraysJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_arrays_jaccard"

  // The merge is only correct on SORTED DISTINCT string arrays (the
  // NGramArray output) — that data-level precondition can't be checked
  // cheaply per row, but the element type can: anything other than
  // array<string> would ClassCastException (or silently mis-compare)
  // inside getUTF8String, so fail at analysis time instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<STRING> arguments (sorted distinct, " +
        s"as produced by ngram_array), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val na = va.numElements()
    val nb = vb.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val c = va.getUTF8String(i).compareTo(vb.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union > 0) inter.toDouble / union else 0.0
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArraysJaccard =
    copy(left = newLeft, right = newRight)
}
