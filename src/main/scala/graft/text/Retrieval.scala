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

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(TextOps.normalize(col("text")), " ")).as("w"))

  /** The BM25 pipeline downstream of query-token selection: df/tf
    * aggregation, the k1/b-saturated per-term score, per-doc sum rounded
    * to 6 decimals. `qtoks` is (doc_id, w) restricted to query terms.
    */
  private def bm25From(qtoks: DataFrame, dl: DataFrame, consts: DataFrame,
                       k1: Double, b: Double): DataFrame = {
    val dfs = qtoks.groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val tf = qtoks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("f"))
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
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokens(docs)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val consts = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(dl.agg(avg(col("dl")).as("avgdl"))))
    bm25From(toks.filter(col("w").isin(terms: _*)), dl, consts, k1, b)
  }

  /** [[bm25Scores]] with a DATA-DEPENDENT term set: `terms` is a
    * single-column (`w`) DataFrame — bounded-small by construction (a
    * query plus its expansion terms) — that rides a broadcast into the
    * token scan in place of the static IN-list. Used by RM3 expansion
    * (q111), whose second pass scores terms only known at run time.
    */
  def bm25ScoresOf(docs: DataFrame, terms: DataFrame,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokens(docs)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val consts = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(dl.agg(avg(col("dl")).as("avgdl"))))
    bm25From(toks.join(broadcast(terms), Seq("w")), dl, consts, k1, b)
  }

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
