package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring as library operators (q93, q109, q111).
  *
  * BM25 is the public Robertson–Spärck Jones ranking function; the
  * constants default to the conventional k1=1.2, b=0.75. Scale shape
  * (unchanged from the original q93 in-query form): per-term document
  * frequencies and the corpus constants (N, avgdl) are a handful of
  * values riding broadcasts; per-doc term frequencies and lengths come
  * off the token scan with map-side combine; the global top-k is the
  * bounded TopKByScore k-heap — no global sort, no per-query window.
  */
object Retrieval {

  /** (doc_id, words) from raw (doc_id, text) — the same derivation as
    * the session words artifact ([[graft.queries.GramMemo]]); query call
    * sites pass the memoized table so the corpus text is normalized
    * once per session, while spec/compat callers derive inline.
    */
  def wordsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      split(TextOps.normalize(col("text")), " ").as("words"))

  private def tokensOfWords(words: DataFrame): DataFrame =
    words.select(col("doc_id"), explode(col("words")).as("w"))

  /** The BM25 pipeline downstream of query-token selection: df/tf
    * aggregation, the k1/b-saturated per-term score, per-doc sum rounded
    * to 6 decimals. `qtoks` is (doc_id, w) restricted to query terms.
    */
  private def bm25From(qtoks: DataFrame, dl: DataFrame, consts: DataFrame,
                       k1: Double, b: Double): DataFrame = {
    // ONE token pass: tf first, then df = rows-per-term OF tf (a term's
    // distinct-doc count is its tf row count — value-identical to
    // countDistinct over the tokens, without a second explode pass over
    // the corpus). tf is bounded by docs × query terms — materializing
    // it keeps the df branch from re-running the token explode (the two
    // branches don't canonicalize to one exchange).
    val tf = qtoks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("f")).localCheckpoint()
    val dfs = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val term = tf.join(dl, Seq("doc_id"))
      .join(broadcast(dfs), Seq("w"))
      .crossJoin(broadcast(consts))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5)) + lit(1.0)) *
          (col("f") * (lit(k1) + 1.0)) /
          (col("f") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
          .as("ts"))
    term.groupBy(col("doc_id")).agg(round(sum(col("ts")), 6).as("score"))
  }

  /** Per-document BM25 score of `docs` (columns `doc_id`, `text`) for a
    * fixed query term set, rounded to 6 decimals. Documents matching no
    * query term produce no row (score 0 by omission), exactly like an
    * inverted-index retrieval would. The static term list filters with
    * `isin`, which stays scan-local.
    */
  def bm25Scores(docs: DataFrame, terms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25ScoresW(wordsOf(docs), terms, k1, b)

  /** [[bm25Scores]] over an already-tokenized (doc_id, words) frame —
    * the query-path form: doc lengths and the corpus constants come from
    * `size(words)` with NO token explode (dl was the second-heaviest
    * derivation), and only the query-term probe explodes — scan-local.
    * When `words` is the memoized session artifact, the corpus text is
    * read zero times by this call.
    */
  def bm25ScoresW(words: DataFrame, terms: Seq[String],
                  k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25From(tokensOfWords(words).filter(col("w").isin(terms: _*)),
      dlOfWords(words), constsOfWords(words), k1, b)

  /** [[bm25ScoresW]] with a DATA-DEPENDENT term set: `terms` is a
    * single-column (`w`) DataFrame — bounded-small by construction (a
    * query plus its expansion terms) — that rides a broadcast into the
    * token scan in place of the static IN-list. Used by RM3 expansion
    * (q111), whose second pass scores terms only known at run time.
    */
  def bm25ScoresOfW(words: DataFrame, terms: DataFrame,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25From(tokensOfWords(words).join(broadcast(terms), Seq("w")),
      dlOfWords(words), constsOfWords(words), k1, b)

  /** Per-doc token count without an explode: `size(words)` is
    * value-identical to counting exploded tokens (split yields one
    * element per token, [""] for empty text in both forms).
    */
  def dlOfWords(words: DataFrame): DataFrame =
    words.select(col("doc_id"), size(col("words")).cast("long").as("dl"))

  private def constsOfWords(words: DataFrame): DataFrame =
    words.agg(count(lit(1)).as("n_docs"),
      avg(size(col("words"))).as("avgdl"))

  /** Global bounded top-k of an (id, score) frame through the TopKByScore
    * k-heap aggregate: each map task forwards at most k rows, ranks are
    * BIGINT starting at 1, ties break on id ascending — the same
    * engine-reproducible order as `row_number() OVER (ORDER BY score
    * DESC, id)`.
    */
  def rankedTopK(scores: DataFrame, k: Int, idCol: String = "doc_id",
                 scoreCol: String = "score"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    scores.agg(column(graft.sim.TopKByScore(
        expression(col(scoreCol)), expression(col(idCol)), k)
        .toAggregateExpression()).as("top"))
      .select(posexplode(col("top")).as(Seq("p", "e")))
      .select(col("e.id").as(idCol), col("e.score").as(scoreCol),
        (col("p") + 1).cast("long").as("rnk"))
  }
}
