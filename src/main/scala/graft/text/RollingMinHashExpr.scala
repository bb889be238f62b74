package graft.text

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Minimum Rabin-style rolling hash over all `k`-byte windows of a binary
  * payload — the rolling-hash document fingerprint (the bottom-1 sketch of
  * the winnowing family): shifted/embedded content keeps its window
  * hashes, so near-identical documents share the minimum with high
  * probability, where a whole-content digest changes completely.
  *
  * hash(window i) = sum_{t<k} byte(i+t) * B^(k-1-t)  (mod M), minimized
  * over i. With B=31, k=8, byte < 256 the pre-mod sum stays < 2^46, so
  * the same arithmetic is exactly reproducible in any engine with 64-bit
  * integers (the DuckDB oracle mirrors it). One O(n) pass via the rolling
  * update h' = (h - lead*B^(k-1)) * B + next.
  *
  * Returns null when the payload has fewer than `k` bytes (no windows).
  */
case class RollingMinHash(child: Expression, k: Int, base: Long, mod: Long)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"window size must be >= 1, got $k")
  // base >= 2: the overflow guard below divides by (base - 1), and a
  // base-1 hash would be position-blind anyway
  require(base >= 2 && mod > 0, "base must be >= 2 and mod positive")
  // the rolling value h stays UNREDUCED (only the snapshot takes % mod):
  // reject parameters whose worst case overflows Long instead of silently
  // returning negative/garbage minima. Worst intermediate during the roll
  // is maxWindowValue * base with maxWindowValue = 255 * (base^k-1)/(base-1).
  require({
    val maxWindow = (BigInt(base).pow(k) - 1) / (base - 1) * 255
    maxWindow * base <= BigInt(Long.MaxValue)
  }, s"base=$base, k=$k overflow 64-bit rolling arithmetic; shrink them")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_min_hash"

  private val lead: Long = { // B^(k-1)
    var p = 1L
    var i = 1
    while (i < k) { p *= base; i += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    if (n < k) return null
    var h = 0L
    var i = 0
    while (i < k) { h = h * base + (bytes(i) & 0xff); i += 1 }
    var min = h % mod
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * lead) * base + (bytes(i) & 0xff)
      val m = h % mod
      if (m < min) min = m
      i += 1
    }
    min
  }

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}
