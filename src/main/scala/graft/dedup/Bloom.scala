package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter membership for decontamination prescans.
  *
  * The production problem: probing every corpus n-gram against the eval
  * gram SET (q56's broadcast join) ships the full eval vocabulary to
  * every executor. At large eval suites the cheaper first pass is a
  * Bloom BITSET — here `M` = 200003 bits filled by `K` = 3 hash
  * positions per gram, so the whole filter is ~25 KiB regardless of
  * eval size. The price is false positives, which a second exact pass
  * resolves on the (tiny) candidate subset only.
  *
  * Spark ships `DataFrameStatFunctions.bloomFilter`, but its hash is
  * engine-private — an oracle in another engine could never reproduce
  * it, and neither could a re-run on a different Spark version claim
  * byte-equality. These positions are md5 slices: pos_j(g) = the j-th
  * 5-hex-char (20-bit) window of md5(g), j < K — deterministic
  * everywhere, same uniformity, and one digest per gram (slicing one md5
  * beats K digests; cf. the MinHash md5-slicing note in [[DedupOps]]).
  *
  * False-positive math at the defaults: fill ratio f = 1-(1-1/M)^(KE)
  * for E eval grams; a probe passes spuriously with ~f^K. At E ≈ 7k
  * grams f ≈ 0.1, FP ≈ 0.1%; at E ≈ 70k grams f ≈ 0.65, FP ≈ 28% — in
  * production you size M to the eval suite (M ≈ 10·E keeps FP ≈ 1%);
  * here M is fixed so one filter definition serves every scale factor's
  * oracle.
  */
object Bloom {

  /** Bits in the filter: a prime, so the 20-bit hex slices fold onto it
    * near-uniformly (a power-of-16 M would just truncate the slice; a
    * prime keeps all slice bits contributing). ~25 KiB of bit positions.
    */
  val M: Int = 200003

  /** Hash positions per element. */
  val K: Int = 3

  /** The K bit positions of one element: adjacent 5-hex-char (20-bit)
    * slices of its single md5 digest, folded mod M.
    */
  def positions(elem: Column): Seq[Column] = (0 until K).map { j =>
    pmod(conv(substring(md5(to_binary(elem, lit("utf-8"))), j * 5 + 1, 5),
      16, 10).cast("int"), lit(M))
  }

  /** All K positions as one array column (for `explode`). */
  def positionsArray(elem: Column): Column = array(positions(elem): _*)

  /** DuckDB mirror of position j of [[positions]]. */
  def positionSql(elem: String, j: Int): String =
    s"(CAST('0x' || substr(md5($elem), ${j * 5 + 1}, 5) AS INTEGER) % $M)"

  /** DuckDB mirror of [[positionsArray]]. */
  def positionsArraySql(elem: String): String =
    (0 until K).map(positionSql(elem, _)).mkString("[", ", ", "]")

  /** Probe every `corpus` row's `gramCol` against the Bloom bitset built
    * from `evalGrams` (a one-column gram frame): appends a `_bloom`
    * membership flag. The bitset rides K broadcast hash joins on the bit
    * positions — scan-local for the corpus side, no shuffle at any
    * corpus size (the 100 TB-shaped prescan; callers aggregate or filter
    * `_bloom` and run the exact verify on the survivors only).
    */
  def probe(corpus: org.apache.spark.sql.DataFrame, gramCol: String,
            evalGrams: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val bits = evalGrams
      .select(explode(positionsArray(col(gramCol))).as("pos")).distinct()
    val ps = positions(col(gramCol))
    val withPos = corpus.select(corpus.columns.map(col) ++
      ps.zipWithIndex.map { case (p, j) => p.as(s"_p$j") }: _*)
    val joined = (0 until K).foldLeft(withPos) { case (acc, j) =>
      acc.join(broadcast(bits.select(col("pos").as(s"_p$j"),
        lit(1).as(s"_h$j"))), Seq(s"_p$j"), "left")
    }
    joined
      .withColumn("_bloom",
        (0 until K).map(j => coalesce(col(s"_h$j"), lit(0)))
          .reduce(_ + _) === K)
      .drop((0 until K).flatMap(j => Seq(s"_p$j", s"_h$j")): _*)
  }

  /** Scan-local variant of [[probe]] — the 100 TB shape: the filter's
    * DISTINCT bit positions (at most `M`, REGARDLESS of eval-set size —
    * the bounded-structure pattern, so the collect is capped at ~200k
    * ints) are packed once into a 64-bit-word bitset and embedded as a
    * single ~25 KiB array literal; each corpus gram then tests its K
    * bits with built-in expressions inside its own scan. ZERO joins:
    * where [[probe]] spent K broadcast probe joins per corpus pass, this
    * adds only per-row arithmetic to the scan the caller already runs.
    */
  def probeBitset(corpus: org.apache.spark.sql.DataFrame, gramCol: String,
                  evalGrams: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    corpus.withColumn("_bloom",
      bitsetHit(col(gramCol), bitsetOf(evalGrams, gramCol)))

  /** The packed 64-bit-word bitset of a one-column element frame — the
    * bounded-structure collect behind [[probeBitset]] (at most M distinct
    * positions regardless of element count, ~25 KiB). Built ONCE at plan
    * time, so a stream-static consumer pays it at stream start, not per
    * micro-batch.
    */
  def bitsetOf(elems: org.apache.spark.sql.DataFrame,
               colName: String): Array[Long] = {
    val pos = elems
      .select(explode(positionsArray(col(colName))).as("pos")).distinct()
      .collect().map(_.getInt(0))
    val words = new Array[Long]((M + 63) / 64)
    pos.foreach(p => words(p >>> 6) |= 1L << (p & 63))
    words
  }

  /** Membership of one element EXPRESSION in a packed bitset — composable
    * inside array lambdas (e.g. `filter(pks, p => bitsetHit(p, words))`),
    * which [[probeBitset]]'s column-name surface can't reach. K bit tests
    * as codegen'd array indexing; never a false negative.
    */
  def bitsetHit(elem: Column, bitWords: Array[Long]): Column = {
    val bitsLit = typedlit(bitWords.toSeq)
    // element_at(maskLit, bit+1) instead of a variable-shift builtin:
    // both lookups stay simple codegen'd array indexing
    val maskLit = typedlit((0 until 64).map(1L << _))
    positions(elem).map { p =>
      element_at(bitsLit, (p / 64).cast("int") + 1)
        .bitwiseAND(element_at(maskLit, pmod(p, lit(64)).cast("int") + 1))
        .=!=(0L)
    }.reduce(_ && _)
  }
}
