package graft.dedup

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** DDSketch-style quantile sketch as a native aggregate with map-side
  * partial merge (Masson, Rim & Lee, "DDSketch: a fast and fully-
  * mergeable quantile sketch with relative-error guarantees", VLDB
  * 2019) — the bounded-memory quantile estimator for double-valued
  * metrics whose distinct space is unbounded at 100 TB, where the exact
  * per-(group, value) histogram q110 builds is unaffordable and
  * `percentile_approx`'s GK summary is not reproducible across engines.
  *
  * Buckets are the q131 integer log-linear map over cents
  * c = floor(100·x): c < 8 exact, else octave o = bit-length(c) split
  * into 8 sub-buckets, bucket key = its lower bound
  * lb = ((c·8) div 2^(o-1)) · 2^(o-4); negative cents clamp to bucket
  * 0. At most 8 buckets per octave ⇒ ≤ 8 + 8·60 buckets EVER,
  * whatever the distribution — constant state
  * per group, constant shuffle payload per partial, and a constant
  * state-store row in streaming. The readout is the type-1 quantile
  * over the cumulative bucket histogram: the reported lower bound
  * under-estimates the exact quantile by < 12.5% guaranteed
  * (Pipeline17Spec pins the bound). All arithmetic is integer, so the
  * estimate is bit-reproducible across engines, retries and
  * partitionings — the DuckDB oracle reproduces it in SQL (q131), and
  * merge is key-wise count addition: a stored per-shard sketch table
  * folds into corpus quantiles without a re-scan (the q128 HLL-fold
  * economics).
  */
case class DdSketchQuantile(
    cents: Expression,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {

  // Plain-Double param (the KmvSketch pattern, KmvAgg.scala:32): an
  // Expression param would need `.foldable`/`.eval()` at construction,
  // which the Column bridge cannot satisfy pre-analysis (its
  // ColumnNodeExpression is unresolved ⇒ foldable=false). The SQL
  // builder (GraftExtensions) evaluates its literal argument instead.
  require(q > 0.0 && q <= 1.0,
    s"dd_quantile: quantile must be in (0, 1], got $q")

  // Readout resolution is 1e-6 (micro-quantile): need = ceil(q·n) is
  // computed as exact Long arithmetic on round(q·1e6), so q=0.995 and
  // q=0.999999 are distinct (the old percent rounding silently mapped
  // 0.995 → p100). Safe to n ≈ 9.2e12 events per group before the
  // Long product could overflow — far past any per-group count.
  private val qMicro: Long = Math.round(q * 1e6)

  override def children: Seq[Expression] = Seq(cents)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "dd_quantile"

  override def createAggregationBuffer()
      : java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def add(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                  lb: Long, n: Long): Unit = {
    val prev = buf.get(lb)
    buf.put(lb, if (prev == null) n else prev + n)
    ()
  }

  override def update(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      input: InternalRow)
      : java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val v = cents.eval(input)
    if (v != null) {
      val c = v.asInstanceOf[java.lang.Number].longValue()
      add(buf, Dd.bucketLb(c), 1L)
    }
    buf
  }

  override def merge(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      other: java.util.TreeMap[java.lang.Long, java.lang.Long])
      : java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey, e.getValue)
    }
    buf
  }

  /** Type-1 readout: smallest bucket lower bound whose cumulative count
    * reaches ceil(q·n) — integer arithmetic, the q110/q131 rule.
    */
  override def eval(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    var tot = 0L
    val it0 = buf.values().iterator()
    while (it0.hasNext) tot += it0.next()
    if (tot == 0L) null
    else {
      val need = (qMicro * tot + 999999L) / 1000000L
      var cum = 0L
      var out: java.lang.Long = null
      val it = buf.entrySet().iterator()
      while (it.hasNext && out == null) {
        val e = it.next()
        cum += e.getValue
        if (cum >= need) out = e.getKey
      }
      out
    }
  }

  override def serialize(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DdSketchQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdSketchQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DdSketchQuantile =
    copy(cents = newChildren(0))
}

object Dd {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** The q131 bucket map on the JVM side — MUST stay in lockstep with
    * the SQL forms ([[bucketLbSqlExpr]] for Spark, [[bucketLbDuckSql]]
    * for the DuckDB oracle; all three live HERE so they cannot drift):
    * c clamped at 0 (a negative metric would otherwise get one exact
    * bucket PER distinct negative value — unbounded state, the exact
    * failure the sketch exists to prevent), c < 8 exact, else 8
    * log-linear sub-buckets per octave ⇒ ≤ 8 + 8·60 buckets ever.
    */
  def bucketLb(c0: Long): Long = {
    val c = if (c0 < 0L) 0L else c0
    if (c < 8L) c
    else {
      val o = 64 - java.lang.Long.numberOfLeadingZeros(c) // bit-length
      ((c * 8L) >> (o - 1)) << (o - 4)
    }
  }

  /** The identical bucket map as a Spark SQL expression over a BIGINT
    * cents column (shared with q131's relational form).
    */
  def bucketLbSqlExpr(c: String): String =
    s"""CASE WHEN $c < 8 THEN greatest($c, 0) ELSE
         shiftleft(($c * 8) div shiftleft(1, length(bin($c)) - 1),
                   length(bin($c)) - 4) END"""

  /** The identical bucket map in the DuckDB dialect (`//` integer
    * division, `<<` shift) — consumed by q131's oracle SQL.
    */
  def bucketLbDuckSql(c: String): String =
    s"""CASE WHEN $c < 8 THEN greatest($c, 0) ELSE
        ((($c * 8) // (1 << (length(bin($c)) - 1)))
          << (length(bin($c)) - 4)) END"""

  /** The sketch quantile as an aggregate Column over BIGINT cents. */
  def ddQuantile(cents: Column, q: Double): Column =
    column(DdSketchQuantile(expression(cents), q).toAggregateExpression())
}
