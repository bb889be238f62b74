package graft.dedup

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared one-pass MinHash core: normalize → distinct k-shingles →
  * per-seed min of the 32-bit md5 slice (digest = seed/4, slice =
  * seed%4), minimized in UNSIGNED int order.
  *
  * Unsigned-int order over the raw 4-byte slice is EXACTLY the
  * lexicographic order of its 8-lowercase-hex-char rendering (hex digits
  * '0'<'1'<…<'9'<'a'<…<'f' are ASCII-monotone with nibble value, fixed
  * width), so [[MinHashSig]] (hex strings, the q31 output form and the
  * DuckDB oracle's) and [[MinHashSigNum]] (unsigned values as longs, the
  * internal lineage form) pick the SAME argmin shingle per component and
  * agree under the bijection value = parseInt(hex, 16) — pinned in
  * MinHashNumEquivalenceSpec.
  *
  * String semantics deliberately reuse Spark's own UTF8String operations
  * (toLowerCase, trim, substringSQL) so results are byte-identical to the
  * composed-expression form and to the DuckDB oracle.
  */
private[dedup] object MinHashCore {
  private val ws = java.util.regex.Pattern.compile("\\s+")
  // one digest per thread: expression instances are shared across the
  // concurrent tasks of local[n] / executor cores.
  private val md =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** Per-component unsigned-int mins (length numHashes). `prefixes` are
    * the precomputed "<digestIdx>|" UTF-8 byte prefixes, one per digest
    * (numDigests = ceil(numHashes/4)).
    */
  def sigMins(raw: UTF8String, k: Int, numHashes: Int,
              prefixes: Array[Array[Byte]]): Array[Int] = {
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

    // init to unsigned max: the shingle set is never empty (an empty
    // text yields the "" shingle), so every component is min'd at least
    // once — and a true 0xffffffff min is the same value anyway.
    val mins = Array.fill[Int](numHashes)(-1)
    val digest = md.get()
    val it = shingles.iterator()
    while (it.hasNext) {
      val shBytes = it.next().getBytes("UTF-8")
      var d = 0
      while (d < prefixes.length) {
        digest.reset()
        digest.update(prefixes(d))
        val h = digest.digest(shBytes)
        var slice = 0
        while (slice < 4 && d * 4 + slice < numHashes) {
          val s = d * 4 + slice
          val v = ((h(slice * 4) & 0xff) << 24) |
            ((h(slice * 4 + 1) & 0xff) << 16) |
            ((h(slice * 4 + 2) & 0xff) << 8) |
            (h(slice * 4 + 3) & 0xff)
          if (java.lang.Integer.compareUnsigned(v, mins(s)) < 0) mins(s) = v
          slice += 1
        }
        d += 1
      }
    }
    mins
  }

  def prefixesFor(numHashes: Int): Array[Array[Byte]] =
    Array.tabulate((numHashes + 3) / 4)(d => (d.toString + "|").getBytes("UTF-8"))

  /** Shared across expression instances: Catalyst copies expression trees
    * during optimization (withNewChildInternal), so a per-instance memo
    * would miss the N element_at copies of the same signature in one
    * Project. Keying on (bytes, k, numHashes) keeps distinct
    * parameterizations from colliding; [[MinHashSig]] and
    * [[MinHashSigNum]] each own one (their cached VALUES differ).
    */
  final class Memo {
    var key: UTF8String = _
    var k: Int = -1
    var numHashes: Int = -1
    var value: Any = _
  }
}

/** One-pass MinHash signature as a native Catalyst expression — HEX form
  * (array of 8-lowercase-hex-char strings), the q31 OUTPUT representation
  * and the one the DuckDB oracle SQL renders.
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
  * A one-entry per-thread memo (shared across instances in
  * [[MinHashCore]], keyed by the input's cloned bytes plus (k,
  * numHashes)) absorbs the repeated-evaluation projection pattern:
  * projecting the signature to N scalar columns via element_at leaves N
  * copies of this expression in one collapsed Project, and interpreted
  * projections get no common subexpression elimination — without the
  * memo the signature was recomputed N times per row (the round-3 q31
  * regression).
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

  private val hexChars = "0123456789abcdef".toCharArray

  // "<digestIdx>|" byte prefixes, precomputed once.
  @transient private lazy val digestPrefixes: Array[Array[Byte]] =
    MinHashCore.prefixesFor(numHashes)

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    val m = MinHashSig.memo.get()
    if (m.k == k && m.numHashes == numHashes &&
        m.key != null && m.key.equals(raw)) return m.value
    val mins = MinHashCore.sigMins(raw, k, numHashes, digestPrefixes)
    val out = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      val v = mins(j)
      val cs = new Array[Char](8)
      var n = 0
      while (n < 8) {
        cs(n) = hexChars((v >>> ((7 - n) * 4)) & 0xf)
        n += 1
      }
      out(j) = UTF8String.fromString(new String(cs))
      j += 1
    }
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
  private[dedup] val memo: ThreadLocal[MinHashCore.Memo] =
    ThreadLocal.withInitial[MinHashCore.Memo](() => new MinHashCore.Memo)
}

/** NUMERIC twin of [[MinHashSig]]: the same signature as an array of
  * LONGS, each the UNSIGNED 32-bit value of the corresponding md5 slice
  * (= parseInt(hexComponent, 16), always in [0, 2^32)). Guide §2.3
  * "narrower types": every internal comparison the dedup lineage makes on
  * a signature component — min over shingles, component equality
  * (est_jaccard, firstBandMatch), band-key grouping — is order/equality
  * over the hex rendering, and unsigned-int order is exactly hex
  * lexicographic order, so swapping the representation preserves every
  * decision bit-for-bit (MinHashNumEquivalenceSpec) while an 8-hex-char
  * UTF8String (8 data bytes + 8-byte offset word per component in an
  * UnsafeRow) becomes one 8-byte long. Use everywhere the signature
  * stays INTERNAL (q50-family lineage, band indexes, incremental
  * artifacts); q31 outputs hex and keeps [[MinHashSig]].
  */
case class MinHashSigNum(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // see MinHashSig: null intolerance would rebuild the expression under
  // a pushed isnotnull Filter and double the per-row cost
  override def nullIntolerant: Boolean = false
  override def prettyName: String = "minhash_sig_num"

  @transient private lazy val digestPrefixes: Array[Array[Byte]] =
    MinHashCore.prefixesFor(numHashes)

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    val m = MinHashSigNum.memo.get()
    if (m.k == k && m.numHashes == numHashes &&
        m.key != null && m.key.equals(raw)) return m.value
    val mins = MinHashCore.sigMins(raw, k, numHashes, digestPrefixes)
    val out = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) { out(j) = mins(j) & 0xffffffffL; j += 1 }
    val result = new GenericArrayData(out)
    m.key = raw.clone()
    m.k = k
    m.numHashes = numHashes
    m.value = result
    result
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigNum =
    copy(child = newChild)
}

object MinHashSigNum {
  private[dedup] val memo: ThreadLocal[MinHashCore.Memo] =
    ThreadLocal.withInitial[MinHashCore.Memo](() => new MinHashCore.Memo)
}
