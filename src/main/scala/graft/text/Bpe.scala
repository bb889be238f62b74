package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) run
  * inside the engine — the vocabulary-learning pass a training-data
  * pipeline executes before token counting, not a model-server call.
  *
  * The scale design rests on one fact: after the single corpus-wide
  * word count, EVERYTHING operates on the vocabulary (distinct words ×
  * counts), which is corpus-bounded and orders of magnitude smaller
  * than the corpus. Each merge round is one bounded pair-count
  * aggregate (map-side combinable onto the symbol-pair space) + a
  * 1-row argmax + a scan-local array rewrite; the driver loop holds
  * only the merge list. Ties on pair count break lexicographically —
  * a total order, so the learned merge sequence is deterministic on
  * any partitioning (BpeSpec pins the classic low/lower/newest/widest
  * golden).
  */
object Bpe {

  /** End-of-word sentinel (kept as its own symbol, the Sennrich form). */
  val Eow = "</w>"

  /** Initial symbol array of a word: its characters plus [[Eow]]. */
  def initSymbols(w: Column): Column =
    concat(split(w, ""), array(lit(Eow)))

  /** Weighted adjacent-pair counts over a (cnt, syms) vocabulary frame:
    * zip_with over 1-shifted slices (the q74 idiom — no positional
    * self-join), summed per (sym_a, sym_b).
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("cnt"),
      explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("sym_a"), col("p.b").as("sym_b"))
      .agg(sum(col("cnt")).as("n"))

  /** One greedy left-to-right non-overlapping merge of (a, b) → ab
    * inside a symbol array — a scan-local fold: a freshly merged `ab`
    * can itself be the left side of a later (a=ab) match but never
    * re-consumes its own right half, which is exactly the
    * non-overlapping contract.
    */
  def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Apply a LEARNED merge sequence to one word — the out-of-vocabulary
    * path of the tokenizer: the merges fold left-to-right in rank order
    * over the word's initial symbols, exactly the training-time rewrite,
    * so a word the training corpus contained encodes to its trained
    * vocab segmentation (BpeSpec pins that equality corpus-wide). The
    * expression is statically unrolled (|merges| nested folds), which is
    * fine for the bounded merge lists the engine trains; the IN-vocab
    * fast path — look the word up in the trained vocab instead — is the
    * shape the corpus-wide apply (q169) uses, because a 100 TB corpus
    * has orders of magnitude more word instances than distinct words.
    */
  def encodeWord(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(initSymbols(w)) { case (s, (a, b)) => mergePair(s, a, b) }

  /** Learn up to `k` merges over the corpus' word vocabulary; returns
    * (merge sequence, final vocab as (w, cnt, syms)). Stops early when
    * no adjacent pair repeats (max count < 2 — merging a count-1 pair
    * learns noise). The vocab is localCheckpoint'ed per round so round
    * r+1 reads r's arrays, not a k-deep lineage.
    */
  def learn(docs: DataFrame, textCol: String,
            k: Int): (Seq[(String, String)], DataFrame) =
    learnFromWords(docs.select(
      split(TextOps.normalize(col(textCol)), " ").as("_w")), "_w", k)

  /** [[learn]] over an already-tokenized word-array column (the
    * [[graft.queries.GramMemo]] words artifact — same normalize, stored
    * once), so training rides the pinned corpus pass.
    */
  def learnFromWords(words: DataFrame, wordsCol: String,
                     k: Int): (Seq[(String, String)], DataFrame) = {
    var vocab = words
      .select(explode(col(wordsCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), initSymbols(col("w")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < k && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("sym_a"), col("sym_b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2L) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        vocab = vocab
          .withColumn("syms", mergePair(col("syms"), a, b))
          .localCheckpoint()
      }
    }
    (merges.toSeq, vocab)
  }
}
