package graft.dedup

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a native mergeable aggregate —
  * the CONSTANT-memory counterpart of [[KmvSketch]]: a KMV sketch costs
  * k longs (2 KiB at k=256) per group and its estimate converges as
  * 1/√k; HLL costs m BYTES (256 B here) for the same asymptotic error
  * (1.04/√m ≈ 6.5%), which is why production cardinality stores (per
  * shard × per day × per source distinct users/urls/tokens) are HLL
  * registers: they max-merge across any partitioning, retry, or stored
  * shard table without re-scanning. Flajolet, Fuss, Gandouet & Meunier
  * 2007 ("HyperLogLog: the analysis of a near-optimal cardinality
  * estimation algorithm"), implemented from the paper.
  *
  * ENGINE-PORTABLE determinism (the q91 house rule — Spark's own
  * `approx_count_distinct` HLL is not reproducible in DuckDB): the input
  * is the full 32-hex-char md5 of the value's string form; register
  * index = the first 2 hex chars (m = 256), rho = 1 + the number of
  * leading zero BITS in the next 13 hex chars (a 52-bit payload, so
  * rho ∈ [1, 53]). Both index and rho are pure hex-string arithmetic a
  * DuckDB oracle reproduces exactly ([[Hll.registersSql]]); the
  * harmonic sum Σ 2^-M[j] adds 256 exact dyadic doubles, so both
  * engines agree to the last bit for all practical register states, and
  * outputs are rounded 4dp besides. Small-range correction (linear
  * counting below 2.5m with empty registers) is applied per the paper;
  * the 52-bit space needs no large-range correction.
  */
case class HllSketch(
    hash: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](Hll.M)

  @inline private def hexVal(c: Byte): Int =
    if (c <= '9') c - '0' else c - 'a' + 10

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val h = hash.eval(input)
    if (h != null) {
      val bytes = h.asInstanceOf[UTF8String].getBytes
      val idx = (hexVal(bytes(0)) << 4) | hexVal(bytes(1))
      // leading zero bits of the 13-nibble payload at hex offsets 2..14
      var rho = 1
      var i = 2
      var found = false
      while (i < 15 && !found) {
        val v = hexVal(bytes(i))
        if (v == 0) rho += 4
        else {
          rho += Integer.numberOfLeadingZeros(v) - 28
          found = true
        }
        i += 1
      }
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < Hll.M) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = Hll.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(hash = newChildren(0))
}

/** [[HllSketch]] that evals to the raw 256-byte REGISTER ARRAY instead
  * of the estimate — the form a production store persists per
  * (shard × day × group) so cardinalities fold across any slice
  * without re-reading events. Folded by [[HllMergeRegisters]].
  */
case class HllRegisters(
    hash: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private val inner = HllSketch(hash)
  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_registers"
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] =
    inner.update(buf, input)
  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    inner.merge(buf, other)
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(hash = newChildren(0))
}

/** Second-level fold: merges STORED register arrays (the
  * [[HllRegisters]] output) by element-wise max and evals to the
  * estimate. Because register max-merge is associative, commutative and
  * idempotent, fold(registers per shard) == sketch(all rows) exactly —
  * the identity q128 pins against the direct q123 aggregation.
  */
case class HllMergeRegisters(
    regs: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(regs)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_merge"
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val r = regs.eval(input)
    if (r != null) merge(buf, r.asInstanceOf[Array[Byte]]) else buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < Hll.M) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = Hll.estimate(buf)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeRegisters =
    copy(regs = newChildren(0))
}

object Hll {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Register count (index = first 2 hex chars of the md5). */
  val M = 256

  /** α₂₅₆ · m² — the paper's bias constant for m ≥ 128. */
  val AlphaM2: Double = 0.7213 / (1.0 + 1.079 / M) * M * M

  /** The estimate from a register array — shared by the aggregate's
    * eval and the spec's direct-register cross-check.
    */
  def estimate(regs: Array[Byte]): Double = {
    var s = 0.0
    var zeros = 0
    var j = 0
    while (j < M) {
      s += java.lang.Math.scalb(1.0, -regs(j))
      if (regs(j) == 0) zeros += 1
      j += 1
    }
    val raw = AlphaM2 / s
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
    else raw
  }

  /** The md5-hex input column for [[HllSketch]]. */
  def md5Hex(v: Column): Column =
    md5(to_binary(v.cast("string"), lit("utf-8")))

  /** The sketch estimate as an aggregate Column over [[md5Hex]] input. */
  def hllDistinct(hashHex: Column): Column =
    column(HllSketch(expression(hashHex)).toAggregateExpression())

  /** The raw register array as an aggregate Column (the stored-artifact
    * form); fold stored arrays with [[hllFold]].
    */
  def hllRegisters(hashHex: Column): Column =
    column(HllRegisters(expression(hashHex)).toAggregateExpression())

  /** Fold of stored register arrays to the estimate. */
  def hllFold(regs: Column): Column =
    column(HllMergeRegisters(expression(regs)).toAggregateExpression())

  /** DuckDB mirror: per-`grp` register table (grp, j, mj) from table
    * `t(grp, h)` of md5 hex strings — emit with FROM the caller's CTEs.
    * One generator so the engines cannot disagree on index/rho
    * arithmetic. `estimateSql` then folds registers to the estimate.
    */
  val registersSql: String = """
    SELECT grp, CAST(('0x' || substr(h, 1, 2)) AS INTEGER) AS j,
           max(CASE WHEN z >= 13 THEN 53
               ELSE 4 * z +
                 CASE WHEN nib = '1' THEN 3
                      WHEN nib IN ('2', '3') THEN 2
                      WHEN nib BETWEEN '4' AND '7' THEN 1
                      ELSE 0 END + 1 END) AS mj
    FROM (SELECT grp, h,
            length(regexp_extract(substr(h, 3, 13), '^(0*)', 1)) AS z,
            substr(substr(h, 3, 13),
              length(regexp_extract(substr(h, 3, 13), '^(0*)', 1)) + 1, 1)
              AS nib
          FROM t)
    GROUP BY grp, j"""

  /** DuckDB mirror of [[estimate]] over `regs(grp, j, mj)` — empty
    * registers contribute 2^0 via the (256 − count) term.
    */
  val estimateSql: String = s"""
    SELECT grp,
      CASE WHEN $AlphaM2 / s <= ${2.5 * M} AND zeros > 0
           THEN $M * ln($M.0 / zeros)
           ELSE $AlphaM2 / s END AS est
    FROM (SELECT grp,
            sum(power(2.0, -mj)) + ($M - count(*)) AS s,
            $M - count(*) AS zeros
          FROM regs GROUP BY grp)"""
}
