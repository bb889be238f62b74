package graft.sim

import java.nio.ByteBuffer
import java.util.PriorityQueue

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k by (score desc, id asc) as a native aggregate with
  * map-side partial merge — the scale-safe replacement for
  * `row_number() OVER (PARTITION BY q_id ORDER BY sim DESC)` top-k:
  *
  *   - each map task keeps a k-element heap per group, so only k rows per
  *     task per group ever reach the shuffle (vs the whole candidate set);
  *   - the reduce side merges heaps — no single-task window over a
  *     query's full candidate list, no OOM at corpus scale.
  *
  * Emits `array<struct<id bigint, score double>>` sorted by
  * (score desc, id asc); `posexplode` turns position into the rank.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PriorityQueue[TopKByScore.Entry]] {

  require(k >= 1, s"top-k size must be >= 1, got $k")

  import TopKByScore.Entry

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): PriorityQueue[Entry] =
    new PriorityQueue[Entry](k + 1, TopKByScore.WorstFirst)

  private def insert(buf: PriorityQueue[Entry], e: Entry): Unit = {
    if (buf.size < k) buf.add(e)
    else {
      val worst = buf.peek()
      // better than the current worst = higher score, or equal score and
      // smaller id (ties rank by id asc)
      if (e.score > worst.score ||
          (e.score == worst.score && e.id < worst.id)) {
        buf.poll(); buf.add(e)
      }
    }
  }

  // tolerate decimal/float scores and int ids (SQL literals parse as
  // DECIMAL) instead of requiring exact buffer types from the caller
  private def asDouble(v: Any): Double = v match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case dec: Decimal => dec.toDouble
    case n: java.lang.Number => n.doubleValue()
  }
  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case n: java.lang.Number => n.longValue()
  }

  override def update(buf: PriorityQueue[Entry], input: InternalRow)
      : PriorityQueue[Entry] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      insert(buf, Entry(asDouble(s), asLong(i)))
    }
    buf
  }

  override def merge(buf: PriorityQueue[Entry], other: PriorityQueue[Entry])
      : PriorityQueue[Entry] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: PriorityQueue[Entry]): Any = {
    val arr = new Array[Entry](buf.size)
    buf.toArray(arr)
    java.util.Arrays.sort(arr, TopKByScore.BestFirst)
    new GenericArrayData(arr.map(e =>
      InternalRow(e.id, e.score): Any))
  }

  override def serialize(buf: PriorityQueue[Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.score); bb.putLong(e.id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.add(Entry(bb.getDouble, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  final case class Entry(score: Double, id: Long)

  /** Heap order: the WORST entry at the head (lowest score; ties put the
    * larger id first, since rank ties break by id asc).
    */
  val WorstFirst: java.util.Comparator[Entry] =
    (a: Entry, b: Entry) => {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    }

  /** Output order: best first (score desc, id asc). */
  val BestFirst: java.util.Comparator[Entry] =
    (a: Entry, b: Entry) => {
      val c = java.lang.Double.compare(b.score, a.score)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
}
