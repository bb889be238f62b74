package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types.{DateType, DoubleType, IntegerType, LongType}
import graft.core._
import graft.dedup.{MinHashSig, NGramJaccard, SimHashSig}
import graft.multimodal.ByteHistogram16
import graft.sim.{DotCosine, TopKByScore}

/** SparkSessionExtensions entry point: injects the engine's custom
  * Catalyst expressions so any session created with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or spark.sql.extensions=graft.plans.GraftExtensions
  *
  * can use them from SQL — the deployment shape for a shared cluster
  * (SURVEY §7 "custom Catalyst" item; spark.sql.extensions is how the
  * jar's operators reach notebooks and JDBC sessions that never touch the
  * Scala API).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    // SQL arguments arrive with whatever type the caller wrote (bigint
    // columns, decimal literals); the engine expressions expect exact
    // types, so coerce at analysis time — the same contract the Scala
    // Column wrappers in graft.functions enforce with .cast
    def asDate(x: Expression) = Cast(x, DateType)
    def asInt(x: Expression) = Cast(x, IntegerType)
    def asDouble(x: Expression) = Cast(x, DoubleType)
    e.injectFunction((FunctionIdentifier("bday_count"),
      info("bday_count", "business days in [start, end), Brazilian dual-regime calendar"),
      (es: Seq[Expression]) => BusinessDayCount(asDate(es.head), asDate(es(1)))))
    e.injectFunction((FunctionIdentifier("add_bdays"),
      info("add_bdays", "roll to business day then add n business days"),
      (es: Seq[Expression]) =>
        AddBusinessDays(asDate(es.head), asInt(es(1)), rollForward = true)))
    e.injectFunction((FunctionIdentifier("is_bday"),
      info("is_bday", "weekday and not a holiday of the date's own regime"),
      (es: Seq[Expression]) => IsBusinessDay(asDate(es.head))))
    e.injectFunction((FunctionIdentifier("truncate_dec"),
      info("truncate_dec", "STN truncation toward zero on the shortest decimal repr"),
      (es: Seq[Expression]) => TruncateDecimal(asDouble(es.head), asInt(es(1)))))
    e.injectFunction((FunctionIdentifier("round_even"),
      info("round_even", "Polars-style scaled ties-to-even rounding"),
      (es: Seq[Expression]) => RoundHalfEvenBinary(asDouble(es.head), asInt(es(1)))))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "one-pass MinHash signature array of a text column"),
      (es: Seq[Expression]) => MinHashSig(es.head, k = 5, numHashes = 8)))
    e.injectFunction((FunctionIdentifier("simhash_sig"),
      info("simhash_sig", "one-pass 16-bit SimHash of a text column"),
      (es: Seq[Expression]) => SimHashSig(es.head)))
    e.injectFunction((FunctionIdentifier("ngram_jaccard"),
      info("ngram_jaccard", "one-pass word-3-gram Jaccard of two text columns, rounded to 6 places"),
      // Round to match the Scala API (DedupOps.jaccardOfTexts rounds to
      // 6 places) — SQL and Column callers must agree on identical inputs
      (es: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions.Round(
        NGramJaccard(es.head, es(1), n = 3),
        org.apache.spark.sql.catalyst.expressions.Literal(6))))
    e.injectFunction((FunctionIdentifier("text_stats"),
      info("text_stats", "one-pass text feature struct (stopword hits, cjk/alpha/punct counts, token counts)"),
      (es: Seq[Expression]) => graft.text.TextStats(es.head)))
    e.injectFunction((FunctionIdentifier("byte_histogram16"),
      info("byte_histogram16", "high-nibble histogram (16 bins) of a binary column"),
      (es: Seq[Expression]) => ByteHistogram16(es.head)))
    e.injectFunction((FunctionIdentifier("dot_cosine"),
      info("dot_cosine", "one-pass cosine similarity of two float-array embeddings"),
      (es: Seq[Expression]) => DotCosine(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("topk_by_score"),
      info("topk_by_score", "bounded top-5 (score, id) aggregate with map-side partial merge"),
      (es: Seq[Expression]) =>
        TopKByScore(Cast(es.head, DoubleType), Cast(es(1), LongType), k = 5)
          .toAggregateExpression()))
  }
}
