package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-trigram language-model scoring — the KenLM-style
  * perplexity-proxy quality filter (CCNet / Llama data curation): score
  * every document by the mean log-probability of its character trigrams
  * under a model estimated from the corpus itself, so "fluent" text
  * (built from common trigrams) scores high and gibberish / OCR noise /
  * wrong-charset text scores low. Unlike the heuristic quality score
  * ([[TextOps.qualityScore]]) this is a STATISTICAL filter: the corpus
  * defines what normal text looks like.
  *
  * Scale shape: the model table is bounded by the trigram space of the
  * normalized charset — at most a few tens of thousands of rows at ANY
  * corpus size — so model estimation is one map-side-combinable count
  * whose shuffle carries ≤ |V| rows per partition, and scoring rides a
  * BROADCAST join of that table into the trigram scan, then ONE shuffle
  * keyed on doc_id with partial aggregation (sum/count combine
  * map-side). Self-scoring ([[score]]) scans the corpus twice (estimate,
  * then score) — the standard two-pass LM shape; the steady state holds
  * the count table as a STORED artifact (session memo
  * [[graft.queries.LmMemo]]; [[mergeCounts]] maintenance) and pays one
  * pass via [[scoreWith]]. A 100 TB deployment additionally estimates
  * the model from a deterministic hash sample ([[graft.ops.Sample.keep]])
  * and scores everyone — sampled-model score fidelity and ranking
  * stability are pinned in TrigramLmSpec.
  *
  * Add-one smoothing with V = distinct observed trigrams keeps the
  * formula exact and engine-portable: logp(t) = ln((c_t + 1) / (N + V)).
  */
object TrigramLm {

  /** Character trigrams of an ALREADY-NORMALIZED string column as an
    * array (overlapping windows; empty array when fewer than 3 chars —
    * the guard matters because `sequence(1, n)` counts DOWN for n < 1).
    *
    * Takes the normalized column, not the raw text, on purpose: Spark's
    * CSE does not cross lambda boundaries, so embedding
    * `TextOps.normalize` here would re-run the whole-document regexp
    * once PER TRIGRAM — O(len²) per doc (measured 20.7 s vs 2.4 s at
    * sf0.1). Materialize the normalization in a projection first.
    */
  def trigramsOfNormalized(n: Column): Column =
    when(length(n) >= 3,
      transform(sequence(lit(1), length(n) - 2), i => n.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  /** Corpus trigram counts (tri, c) — the mergeable model state. */
  def counts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(TextOps.normalize(col(textCol)).as("_n"))
      .select(explode(trigramsOfNormalized(col("_n"))).as("tri"))
      .groupBy(col("tri")).agg(count(lit(1)).as("c"))

  /** Incremental model maintenance — the loop a continuous ingestion
    * pipeline runs: fold a day's admitted documents into the stored
    * count table without re-scanning the corpus. Equal to a full
    * rebuild exactly (counts are integers; spec-pinned), and the
    * shuffle is bounded by the trigram space, not the corpus.
    */
  def mergeCounts(stored: DataFrame, newDocs: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    stored.unionByName(counts(newDocs, idCol, textCol))
      .groupBy(col("tri")).agg(sum(col("c")).as("c"))

  /** The model as ONE broadcastable row: `logp` map over the observed
    * trigram space plus the unseen-trigram default ln(1/(N+V)) — the
    * probe payload for scan-local scoring of a document STREAM
    * ([[graft.streaming.EventStreams.lmScoreStream]]), where the
    * per-doc aggregation must happen inside the row (no shuffle, no
    * state store). Bounded by the charset's trigram space at any
    * corpus size.
    */
  def modelFrame(cnts: DataFrame): DataFrame = {
    val totals = cnts.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    cnts.crossJoin(broadcast(totals))
      .select(col("tri"),
        log((col("c") + lit(1.0)) / (col("n") + col("v"))).as("logp"),
        (col("n") + col("v")).as("_nv"))
      .agg(map_from_entries(collect_list(struct(col("tri"), col("logp"))))
        .as("logp_map"),
        log(lit(1.0) / max(col("_nv"))).as("default_logp"))
  }

  /** (id, n_tri, lm_score): mean trigram log-probability per document,
    * rounded to 6 dp (sum order across engines/partitions wobbles below
    * 1e-12; the rounding pins the value). Documents shorter than one
    * trigram keep n_tri = 0 and a null score. Estimates the model from
    * `docs` itself — the self-scoring two-pass shape; a pipeline with a
    * STORED count table (maintained by [[mergeCounts]]) calls
    * [[scoreWith]] and pays one corpus scan instead of two.
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreWith(docs, counts(docs, idCol, textCol), idCol, textCol)

  /** [[score]] against a PREBUILT count table (the stored model
    * artifact): one corpus scan — trigram explode, broadcast logp probe,
    * one doc-keyed aggregation with map-side combine. The count table
    * must cover every trigram of `docs` for exact [[score]] parity
    * (true when it was estimated from a superset of `docs`, the q87
    * shape); trigrams absent from the model are dropped from n_tri —
    * for partial/sampled models that must score unseen trigrams at the
    * smoothed default, use [[modelFrame]] +
    * [[graft.streaming.EventStreams.lmScoreStream]].
    */
  def scoreWith(docs: DataFrame, cnts: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val tri = docs
      .select(col(idCol).as("_id"),
        TextOps.normalize(col(textCol)).as("_n"))
      .select(col("_id"), explode(trigramsOfNormalized(col("_n"))).as("tri"))
    val totals = cnts.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    val logp = cnts.crossJoin(broadcast(totals))
      .select(col("tri"),
        log((col("c") + lit(1.0)) / (col("n") + col("v"))).as("logp"))
    val scored = tri.join(broadcast(logp), Seq("tri"))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_tri"), sum(col("logp")).as("_s"))
    docs.select(col(idCol).as("_id"))
      .join(scored, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(col("_s") / col("n_tri"), 6).as("lm_score"))
  }

  /** The model as driver-held arrays — the payload of the
    * [[TrigramLmScore]] expression. Bounded by the normalized charset's
    * trigram space at any corpus size (the [[modelFrame]] broadcast
    * argument), so the collect is a bounded model fetch, not a corpus
    * materialization.
    */
  final case class CollectedModel(tris: Array[String],
                                  logps: Array[Double],
                                  defaultLogp: Double)

  /** Collapses a one-row [[modelFrame]] into a [[CollectedModel]] — the
    * bounded fetch the streaming scorers do at stream build time.
    */
  def collectModelFrame(model: DataFrame): CollectedModel = {
    val row = model.select(col("logp_map"), col("default_logp")).head()
    val m = row.getMap[String, Double](0)
    val tris = new Array[String](m.size)
    val logps = new Array[Double](m.size)
    var i = 0
    m.foreach { case (t, lp) => tris(i) = t; logps(i) = lp; i += 1 }
    CollectedModel(tris, logps, row.getDouble(1))
  }

  /** Collects a count table into a [[CollectedModel]] with the same
    * add-one smoothing as [[modelFrame]].
    */
  def collectModel(cnts: DataFrame): CollectedModel = {
    val rows = cnts.select(col("tri"), col("c").cast("long")).collect()
    var n = 0L
    rows.foreach(r => n += r.getLong(1))
    val v = rows.length
    val tris = new Array[String](v)
    val logps = new Array[Double](v)
    var i = 0
    while (i < v) {
      tris(i) = rows(i).getString(0)
      logps(i) = math.log((rows(i).getLong(1) + 1.0) / (n + v))
      i += 1
    }
    CollectedModel(tris, logps, math.log(1.0 / (n + v)))
  }

  /** Scan-local scoring against a [[CollectedModel]]: one pass per
    * document inside the row via the [[TrigramLmScore]] native
    * expression — no trigram explode, no per-instance shuffle rows, no
    * doc-keyed aggregation. Same (id, n_tri, lm_score) contract as
    * [[score]]; with a model covering the corpus the values are
    * identical (spec-pinned), and unseen trigrams take the smoothed
    * default (what an out-of-corpus document should pay).
    */
  def scoreInRow(docs: DataFrame, model: CollectedModel, idCol: String,
                 textCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    docs
      .select(col(idCol), TextOps.normalize(col(textCol)).as("_n"))
      .select(col(idCol),
        column(TrigramLmScore(expression(col("_n")), model.tris,
          model.logps, model.defaultLogp)).as("_r"))
      .select(col(idCol),
        col("_r.n_tri").as("n_tri"),
        when(col("_r.n_tri") > 0,
          round(col("_r.lm_sum") / col("_r.n_tri"), 6)).as("lm_score"))
  }
}
