package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication family for training-data pipelines, designed shuffle-first:
  *
  *   - exact: hash-groupBy on a content fingerprint (one shuffle on the
  *     16-byte digest — at 100 TB this is the canonical map-side-combine
  *     friendly dedup);
  *   - MinHash + LSH: per-row signature (scan-local), banding, and a
  *     bucket-join on band keys — near-dup candidates come from equi-join
  *     shuffles on short keys instead of an O(n²) cross join;
  *   - SimHash: per-row 16-bit signature from md5 hex-digit high bits;
  *   - n-gram Jaccard: exact similarity on candidate pairs only.
  *
  * Hashes are md5-hex based (not murmur) so results are engine-portable —
  * any SQL engine with md5 reproduces them bit-for-bit.
  */
object DedupOps {

  /** MinHash signature component `seed`: lexicographic min of
    * md5(seed || shingle) — a valid min-hash family over the md5 order.
    */
  def minhash(c: Column, k: Int, seed: Int): Column = {
    val n = TextOps.normalize(c)
    val sh = transform(
      sequence(lit(1), greatest(length(n) - (k - 1), lit(1))),
      i => n.substr(i, lit(k)))
    array_min(transform(array_distinct(sh),
      x => substring(md5(to_binary(concat(lit(seed.toString), lit("|"), x),
        lit("utf-8"))), 1, 8)))
  }

  /** All `numHashes` signature columns named m0..m{n-1}. */
  def minhashSignature(c: Column, k: Int, numHashes: Int): Seq[(String, Column)] =
    (0 until numHashes).map(i => s"m$i" -> minhash(c, k, i))

  /** LSH band key: concatenation of `rowsPerBand` adjacent signature
    * components, hashed. Rows sharing any band key are near-dup candidates.
    */
  def bandKey(sig: Seq[Column], band: Int, rowsPerBand: Int): Column = {
    val parts = sig.slice(band * rowsPerBand, (band + 1) * rowsPerBand)
    md5(to_binary(concat_ws("|", (lit(band.toString) +: parts): _*), lit("utf-8")))
  }

  /** 16-bit SimHash from word unigrams: bit j is set when the count of
    * words whose j-th md5 hex digit has its high bit set exceeds half the
    * words. Engine-portable (hex-digit test instead of integer hashing).
    */
  def simhash16(c: Column): Column = {
    val words = array_distinct(split(TextOps.normalize(c), " "))
    val hashes = transform(words, w => md5(to_binary(w, lit("utf-8"))))
    val nWords = size(words)
    val bits = (0 until 16).map { j =>
      val ones = size(filter(hashes,
        h => substring(h, j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f")))
      when(ones * 2 > nWords, lit(1 << j)).otherwise(lit(0))
    }
    bits.reduce(_ + _).cast("int")
  }

  /** Exact word n-gram Jaccard similarity between two text columns. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    def grams(c: Column): Column = {
      val w = split(TextOps.normalize(c), " ")
      array_distinct(
        transform(sequence(lit(0), greatest(size(w) - n, lit(0))),
          i => array_join(slice(w, i + lit(1), lit(n)), " ")))
    }
    val (ga, gb) = (grams(a), grams(b))
    val inter = size(array_intersect(ga, gb)).cast("double")
    val uni = size(ga) + size(gb) - size(array_intersect(ga, gb))
    round(when(uni > 0, inter / uni.cast("double")).otherwise(lit(0.0)), 6)
  }

  /** Exact dedup: keep the smallest id per exact-content fingerprint. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("_fp", TextOps.fingerprint(col(textCol)))
      .groupBy(col("_fp").as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))
}
