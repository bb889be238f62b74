package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass trigram-LM scoring as a native Catalyst expression: walks
  * the normalized text's CODE POINTS once, looks each trigram up in an
  * open-addressing long->double table (trigram = 3 code points <= 21
  * bits each, packed into one 63-bit key) and returns
  * struct(n_tri, lm_sum) — sum of logp over trigram instances, unseen
  * instances at the smoothed default.
  *
  * Why an expression and not the relational explode->broadcast-join->
  * agg ([[TrigramLm.scoreWith]], kept as the semantic twin): scoring
  * materializes one row PER TRIGRAM INSTANCE (~1e3 per doc — billions
  * of rows at 100 TB) only to sum them straight back per doc, and the
  * in-row `element_at` alternative is no alternative at all — Spark map
  * literals are array-backed, every lookup is a LINEAR key scan
  * (measured 25 s vs 2.4 s at sf0.1 for the whole query). A real hash
  * probe per instance makes scoring a pure scan-stage projection: no
  * explode, no per-instance shuffle rows, no state.
  *
  * Trigram semantics are EXACTLY `substr(n, i, 3)`'s (code points, not
  * UTF-16 units — TrigramLmSpec pins the parity on astral input), and
  * the sum accumulates left-to-right exactly like the HOF `aggregate`
  * fold it replaces, so results are bit-identical to
  * [[TrigramLm.trigramsOfNormalized]]-based scoring.
  *
  * The model rides the expression tree as plain arrays (driver-held,
  * shipped once per stage with the task binary): bounded by the
  * normalized charset's trigram space — a few tens of thousands of
  * entries at ANY corpus size (the [[TrigramLm.modelFrame]] broadcast
  * argument; same boundedness that licenses the Bloom-bitset literal in
  * [[graft.dedup.Bloom]]). NULL input (null text) yields the same row a
  * trigram-less document gets: (0, null) — the caller's
  * `when(n_tri > 0, ...)` then leaves the score null.
  */
case class TrigramLmScore(child: Expression, tris: Array[String],
                          logps: Array[Double], defaultLogp: Double)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TrigramLmScore.schema
  override def nullable: Boolean = false
  override def prettyName: String = "trigram_lm_score"

  @transient private lazy val table: TrigramLmScore.CpMap = {
    val m = new TrigramLmScore.CpMap(tris.length)
    var i = 0
    while (i < tris.length) {
      val k = TrigramLmScore.packKey(tris(i))
      if (k >= 0) m.put(k, logps(i))
      i += 1
    }
    m
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return InternalRow(0L, null)
    val s = v.asInstanceOf[UTF8String].toString
    val len = s.length
    var cp0 = -1
    var cp1 = -1
    var nTri = 0L
    var sum = 0.0
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (cp0 >= 0) {
        val key = (cp0.toLong << 42) | (cp1.toLong << 21) | cp.toLong
        sum += table.getOrDefault(key, defaultLogp)
        nTri += 1
      }
      cp0 = cp1
      cp1 = cp
    }
    if (nTri == 0L) InternalRow(0L, null) else InternalRow(nTri, sum)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TrigramLmScore = copy(child = newChild)
}

object TrigramLmScore {

  val schema: StructType = StructType(Seq(
    StructField("n_tri", LongType, nullable = false),
    StructField("lm_sum", DoubleType, nullable = true)))

  /** 3 code points -> 63-bit key; -1 when the string is not exactly 3
    * code points (such a key matches no scanned trigram, so dropping it
    * is sound — and [[TrigramLm.counts]] only emits 3-cp trigrams).
    */
  private[text] def packKey(tri: String): Long = {
    if (tri == null) return -1L
    val len = tri.length
    if (len < 3 || len > 6) return -1L
    val c0 = tri.codePointAt(0)
    val i1 = Character.charCount(c0)
    if (i1 >= len) return -1L
    val c1 = tri.codePointAt(i1)
    val i2 = i1 + Character.charCount(c1)
    if (i2 >= len) return -1L
    val c2 = tri.codePointAt(i2)
    if (i2 + Character.charCount(c2) != len) return -1L
    (c0.toLong << 42) | (c1.toLong << 21) | c2.toLong
  }

  /** Open-addressing long->double map, linear probing, power-of-two
    * capacity at load factor <= 0.5. Keys are non-negative (63-bit
    * packed code points); -1 marks an empty slot.
    */
  private[text] final class CpMap(n: Int) {
    private val cap: Int = {
      var c = 4
      while (c < n * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val keys = Array.fill[Long](cap)(-1L)
    private val vals = new Array[Double](cap)

    private def slot(k: Long): Int =
      ((k * 0x9E3779B97F4A7C15L) >>> 32).toInt & mask

    def put(k: Long, v: Double): Unit = {
      var i = slot(k)
      while (keys(i) >= 0 && keys(i) != k) i = (i + 1) & mask
      keys(i) = k
      vals(i) = v
    }

    def getOrDefault(k: Long, default: Double): Double = {
      var i = slot(k)
      while (keys(i) >= 0) {
        if (keys(i) == k) return vals(i)
        i = (i + 1) & mask
      }
      default
    }
  }
}
