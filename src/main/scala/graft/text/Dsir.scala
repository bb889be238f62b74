package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
  * with Importance Resampling"): documents scored by the hashed-unigram
  * log-likelihood ratio of a TARGET slice's bag model over the RAW
  * corpus model. Features hash into a FIXED 4096-bucket space (3 hex
  * chars of md5 — the engine-portable q51 idiom), which is the whole
  * scale trick: both models are bucket-bounded aggregates and the whole
  * ratio table compresses to ONE broadcast row (logp-ratio map +
  * unseen-bucket default), so scoring is a scan-local array fold with
  * NO shuffle at all — the [[graft.streaming.EventStreams.lmScoreStream]]
  * shape, and why the same expression runs unchanged at the streaming
  * ingestion door. Per-bucket ratios are 6-dp-pinned before the sum
  * (the q92 rule).
  */
object Dsir {

  val Buckets = 4096

  /** Seeded-free 4096-way bucket of a token (mirror:
    * `substr(md5(w), 1, 3)` in DuckDB).
    */
  def bucket(w: Column): Column =
    substring(md5(to_binary(w, lit("utf-8"))), 1, 3)

  /** One-row model from a labeled corpus: per-bucket 6-dp log-ratios as
    * a map plus the unseen-bucket default (ct = cr = 0 through the same
    * add-one smoothing — what a bucket never seen in the model corpus
    * must pay at the ingestion door).
    */
  def modelFrame(docs: DataFrame, textCol: String,
                 isTarget: Column): DataFrame =
    modelFrameOfWords(docs.select(
      split(TextOps.normalize(col(textCol)), " ").as("_ws"),
      isTarget.as("_t")), "_ws", col("_t"))

  /** [[modelFrame]] over an ALREADY-materialized word-array frame (the
    * [[graft.queries.GramMemo]] artifact) — no re-normalize pass.
    */
  def modelFrameOfWords(words: DataFrame, wordsCol: String,
                        isTarget: Column): DataFrame = {
    val bk = words
      .select(explode(col(wordsCol)).as("w"), isTarget.as("_t"))
      .select(bucket(col("w")).as("b"), col("_t"))
    // ≤4096 rows; materialized because the totals branch and the ratio
    // projection don't canonicalize to a shared exchange — without this
    // the corpus explode ran twice (ScanAudit)
    val counts = bk.groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("_t"), 1L).otherwise(0L)).as("ct"))
      .localCheckpoint()
    val tot = counts.agg(sum(col("ct")).as("t"), sum(col("cr")).as("r"))
    counts.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log((col("ct") + lit(1.0)) / (col("t") + lit(Buckets))) -
          log((col("cr") + lit(1.0)) / (col("r") + lit(Buckets))), 6)
          .as("lr"),
        round(log(lit(1.0) / (col("t") + lit(Buckets))) -
          log(lit(1.0) / (col("r") + lit(Buckets))), 6).as("default_lr"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("lr"))))
          .as("lr_map"),
        first(col("default_lr")).as("default_lr"))
  }

  /** Scan-local scoring: the model rides ONE broadcast row joined on a
    * constant key; the per-doc score folds over the token array INSIDE
    * the row — no scoring shuffle, no state, identical on batch and
    * streaming frames. Returns (id, n_tokens, dsir_score).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame): DataFrame =
    scoreOfWords(docs.select(col(idCol),
      split(TextOps.normalize(col(textCol)), " ").as("_ws")),
      idCol, "_ws", model)

  /** [[score]] over an ALREADY-materialized word-array frame. */
  def scoreOfWords(words: DataFrame, idCol: String, wordsCol: String,
                   model: DataFrame): DataFrame =
    words
      .select(col(idCol), col(wordsCol).as("_ws"), lit(1).as("_k"))
      .join(broadcast(model.withColumn("_k", lit(1))), Seq("_k"))
      .select(col(idCol), size(col("_ws")).cast("long").as("n_tokens"),
        round(aggregate(col("_ws"), lit(0.0), (acc, w) =>
          acc + coalesce(element_at(col("lr_map"), bucket(w)),
            col("default_lr"))), 6).as("dsir_score"))
}
