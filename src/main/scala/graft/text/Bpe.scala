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

  /** A finished training run: the merge sequence grouped by the round
    * that learned it (so the batching discipline is inspectable — every
    * batch is pairwise symbol-disjoint, BpeBatchSpec pins it) and the
    * final vocabulary as (w, cnt, syms).
    */
  final case class BpeTrain(batches: Seq[Seq[(String, String)]],
                            vocab: DataFrame) {
    def merges: Seq[(String, String)] = batches.flatten
    def rounds: Int = batches.size
  }

  /** Learn up to `k` merges over the corpus' word vocabulary; returns
    * (merge sequence, final vocab as (w, cnt, syms)). Stops early when
    * no adjacent pair repeats (max count < 2 — merging a count-1 pair
    * learns noise). One merge per Spark round — the exact Sennrich
    * sequence the goldens and the q169 oracle pin; production merge
    * budgets batch via [[learnBatched]].
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
    val t = learnBatched(words, wordsCol, k, batch = 1)
    (t.merges, t.vocab)
  }

  /** Greedy symbol-disjoint batch selection from one round's ranked
    * (count desc, lexicographic) pair list: walk the ranking, admit a
    * pair iff it shares NO symbol with an already-admitted pair AND
    * neither of its symbols is an already-admitted pair's merged
    * output AND its own merged output collides with no admitted
    * symbol or output. Disjointness is what makes the batch sound: a
    * merge only perturbs adjacency counts of pairs touching its own
    * symbols, so every admitted pair's count is still its round-start
    * count when its turn in the fold comes — each admitted merge acts
    * on exactly the adjacencies it was ranked on. (The output-collision
    * guards close the a+b=="ab" aliasing hole where a later fold step
    * would consume symbols a previous step just created.) Skipped
    * conflicting pairs are re-ranked next round against the updated
    * counts — that is the recount the sequential learner does after
    * every single merge.
    */
  def selectBatch(ranked: Seq[(String, String)],
                  batch: Int): Seq[(String, String)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val it = ranked.iterator
    while (out.size < batch && it.hasNext) {
      val (a, b) = it.next()
      if (!used(a) && !used(b) && !used(a + b)) {
        used += a; used += b; used += (a + b)
        out += ((a, b))
      }
    }
    out.toSeq
  }

  /** Batched BPE training: per round, ONE vocabulary pair-count
    * aggregate ranks candidates and up to `batch` symbol-disjoint
    * merges (see [[selectBatch]]) apply together before the next
    * recount. `batch = 1` IS the sequential Sennrich learner
    * ([[learnFromWords]] delegates here; the goldens pin the
    * equivalence). The point is the round count: a production
    * tokenizer's 32k–100k merge budget at one Spark job per merge is
    * tens of thousands of sequential jobs; at `batch = m` the driver
    * loop shrinks ~m× while each admitted merge still acts on exact
    * round-start counts — the standard large-vocab BPE practice. The
    * trade is path, not soundness: a conflict-skipped pair re-ranks
    * next round against updated counts, so `batch > 1` can learn a
    * (slightly) different — equally count-justified — merge order
    * than `batch = 1`.
    *
    * Per round the driver collects `max(8*batch, 64)` candidate rows
    * (bounded; conflicts rarely eat 7/8 of a disjoint ranking), folds
    * the batch into one `syms` rewrite, and localCheckpoint's so round
    * r+1 reads r's arrays, not a deep lineage.
    */
  def learnBatched(words: DataFrame, wordsCol: String,
                   k: Int, batch: Int): BpeTrain = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    var vocab = words
      .select(explode(col(wordsCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), initSymbols(col("w")).as("syms"))
      .localCheckpoint()
    val batches =
      scala.collection.mutable.ArrayBuffer.empty[Seq[(String, String)]]
    var learned = 0
    var done = false
    while (learned < k && !done) {
      val want = math.min(batch, k - learned)
      val ranked = pairCounts(vocab)
        .filter(col("n") >= 2) // merging a count-1 pair learns noise
        .orderBy(col("n").desc, col("sym_a"), col("sym_b"))
        .limit(math.max(8 * want, 64)).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      val picked = selectBatch(ranked, want)
      if (picked.isEmpty) done = true
      else {
        batches += picked
        learned += picked.size
        vocab = vocab
          .withColumn("syms", picked.foldLeft(col("syms")) {
            case (s, (a, b)) => mergePair(s, a, b)
          })
          .localCheckpoint()
      }
    }
    BpeTrain(batches.toSeq, vocab)
  }
}
