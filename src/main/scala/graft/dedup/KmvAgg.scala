package graft.dedup

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native aggregate
  * with map-side partial merge — the bounded-memory cardinality
  * estimator for columns whose distinct space is NOT bounded (user ids,
  * URLs, pair keys), where the exact `groupBy(col).count` shuffle is
  * unaffordable at 100 TB and `approx_count_distinct`'s HLL is not
  * reproducible across engines.
  *
  * The sketch keeps the k smallest DISTINCT hash values seen (a TreeSet
  * caps both memory and shuffle payload at k longs per group per task);
  * the estimator is the classic (k-1) / u_k with u_k = the k-th smallest
  * hash normalized to [0, 1). Below k distinct values the sketch is the
  * exact count. Determinism: the hash is the caller's 52-bit md5 prefix
  * ([[Kmv.hash52]]) — 52 bits so the normalization u_k = h / 2^52 is
  * DOUBLE-exact — making estimates bit-reproducible across engines,
  * retries and partitionings (the DuckDB oracle reproduces them from
  * SQL: [[Kmv.estimateSql]]).
  *
  * Merge is union-and-trim, so partial sketches combine map-side
  * exactly like any algebraic aggregate — and a stored per-shard sketch
  * table can be folded into corpus-level cardinalities without a
  * re-scan.
  */
case class KmvSketch(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }
  }

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case n: java.lang.Number => n.longValue()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val h = hash.eval(input)
    if (h != null) insert(buf, asLong(h))
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  /** size < k ⇒ no value was ever evicted ⇒ the sketch IS the distinct
    * set: exact. Otherwise (k-1) / (u_k / 2^52), u_k = largest kept.
    */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble / (buf.last().toDouble / Kmv.Pow52)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(hash = newChildren(0))
}

object Kmv {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** 2^52 — the hash space; 52 bits keep every h / 2^52 double-exact. */
  val Pow52: Double = 4503599627370496.0

  /** 52-bit hash: the first 13 hex chars of md5 of the value's string
    * form. SQL mirror: `CAST('0x' || substr(md5(CAST(x AS VARCHAR)),
    * 1, 13) AS BIGINT)`.
    */
  def hash52(v: Column): Column =
    conv(substring(md5(to_binary(v.cast("string"), lit("utf-8"))), 1, 13),
      16, 10).cast("long")

  /** The sketch estimate as an aggregate Column over [[hash52]] input. */
  def kmvDistinct(hash: Column, k: Int): Column =
    column(KmvSketch(expression(hash), k).toAggregateExpression())

  /** DuckDB mirror: per-`group` estimate from table `t(group, hv)` of
    * DISTINCT 52-bit hashes — emit with `FROM` the caller's CTEs. One
    * generator so the engines cannot disagree on the formula.
    */
  def estimateSql(k: Int): String = s"""
    SELECT grp, CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
      ELSE (CAST($k AS INTEGER) - 1) / (CAST(max(CASE WHEN rn = $k THEN hv END)
        AS DOUBLE) / 4503599627370496.0) END AS est
    FROM (SELECT grp, hv, row_number() OVER
            (PARTITION BY grp ORDER BY hv) AS rn
          FROM t) WHERE rn <= $k GROUP BY grp"""
}
