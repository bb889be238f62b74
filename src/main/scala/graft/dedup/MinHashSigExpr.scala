package graft.dedup

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature as a native Catalyst expression.
  *
  * Semantically identical to the composed higher-order-function form
  * (normalize → distinct k-shingles → per-seed lexicographic min of an
  * 8-hex-char slice of md5(seed/4|shingle), slice index seed%4) but ~10x
  * faster: HOF lambdas evaluate interpreted with per-element boxing,
  * while this computes the whole signature in tight JVM code with one
  * reused MessageDigest. Four signature components share one md5 digest
  * (four disjoint 32-bit hex ranges are four approximately independent
  * orderings), so the digest count per shingle is ceil(numHashes/4), not
  * numHashes. Per-row CodegenFallback cost is irrelevant (one call per
  * row).
  *
  * String semantics deliberately reuse Spark's own UTF8String operations
  * (toLowerCase, trim, substringSQL) so results are byte-identical to the
  * expression form and to the DuckDB oracle.
  *
  * A one-entry per-thread memo (shared across instances in the companion,
  * keyed by the input's cloned bytes plus (k, numHashes)) absorbs the
  * repeated-evaluation projection pattern: projecting the signature to N
  * scalar columns via element_at leaves N copies of this expression in
  * one collapsed Project, and interpreted projections get no common
  * subexpression elimination — without the memo the signature was
  * recomputed N times per row (the round-3 q31 regression).
  */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // Deliberately NOT null-intolerant: advertising null intolerance lets
  // constraint inference rebuild this (expensive) expression inside an
  // isnotnull() Filter below the Project — doubling the per-row signature
  // cost. Null inputs still yield null (UnaryExpression's default eval).
  override def nullIntolerant: Boolean = false
  override def prettyName: String = "minhash_sig"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  // one digest per thread: expression instances are shared across the
  // concurrent tasks of local[n] / executor cores.
  @transient private lazy val md =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  // one digest serves 4 signature slices
  private val numDigests = (numHashes + 3) / 4

  // "<digestIdx>|" byte prefixes, precomputed once.
  @transient private lazy val digestPrefixes: Array[Array[Byte]] =
    Array.tabulate(numDigests)(d => (d.toString + "|").getBytes("UTF-8"))

  /** Full 32-hex-char digest of prefix||body into `out`. */
  private def md5Hex32(prefix: Array[Byte], body: Array[Byte],
                       out: Array[Char]): Unit = {
    val digest = md.get()
    digest.reset()
    digest.update(prefix)
    val d = digest.digest(body)
    var i = 0
    while (i < 16) {
      out(i * 2) = hexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
  }

  /** hex(off..off+8) < min? (lexicographic, ASCII hex) */
  private def sliceLess(hex: Array[Char], off: Int, min: String): Boolean = {
    var i = 0
    while (i < 8) {
      val c = hex(off + i); val m = min.charAt(i)
      if (c < m) return true
      if (c > m) return false
      i += 1
    }
    false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    val m = MinHashSig.memo.get()
    if (m.k == k && m.numHashes == numHashes &&
        m.key != null && m.key.equals(raw)) return m.value
    // normalize: lower + collapse whitespace runs + trim (same ops as
    // lower/regexp_replace/trim expressions).
    val lowered = raw.toLowerCase.toString
    val normalized = UTF8String.fromString(
      ws.matcher(lowered).replaceAll(" ")).trim()

    val nChars = normalized.numChars()
    val last = math.max(nChars - (k - 1), 1)
    val shingles = new java.util.LinkedHashSet[String]()
    var i = 1
    while (i <= last) {
      shingles.add(normalized.substringSQL(i, k).toString)
      i += 1
    }

    val mins = Array.fill[String](numHashes)(null)
    val hex = new Array[Char](32)
    val it = shingles.iterator()
    while (it.hasNext) {
      val shBytes = it.next().getBytes("UTF-8")
      var d = 0
      while (d < numDigests) {
        md5Hex32(digestPrefixes(d), shBytes, hex)
        var slice = 0
        while (slice < 4 && d * 4 + slice < numHashes) {
          val s = d * 4 + slice
          if (mins(s) == null || sliceLess(hex, slice * 8, mins(s)))
            mins(s) = new String(hex, slice * 8, 8)
          slice += 1
        }
        d += 1
      }
    }
    val out = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) { out(j) = UTF8String.fromString(mins(j)); j += 1 }
    val result = new GenericArrayData(out)
    // clone the key: eval inputs hand out views over reused scan buffers
    m.key = raw.clone()
    m.k = k
    m.numHashes = numHashes
    m.value = result
    result
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Shared across expression instances: Catalyst copies expression trees
    * during optimization (withNewChildInternal), so a per-instance memo
    * would miss the N element_at copies of the same signature in one
    * Project. Keying on (bytes, k, numHashes) keeps distinct
    * parameterizations from colliding.
    */
  final class Memo {
    var key: UTF8String = _
    var k: Int = -1
    var numHashes: Int = -1
    var value: Any = _
  }
  private[dedup] val memo: ThreadLocal[Memo] =
    ThreadLocal.withInitial[Memo](() => new Memo)
}
