package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token column: d = 3 seeded md5 hash rows ×
  * w = 4096 buckets (3 hex chars of the seeded digest — the
  * engine-portable q51 idiom, `substr(md5('<seed>' || w), 1, 3)` in
  * DuckDB). The sketch is the bounded-memory stand-in for an exact
  * corpus-wide word count: counters only ever over-count (estimate =
  * min over the d rows ≥ true count, pinned in Pipeline11Spec), and
  * the whole structure is ≤ d·w counters no matter the corpus.
  * Shared by batch q97 and the streaming sketch maintainer
  * ([[graft.streaming.EventStreams.cmsSketchStream]]).
  */
object Cms {

  val Seeds: Seq[String] = Seq("cms0:", "cms1:", "cms2:")

  /** Seeded 4096-way bucket of a token. */
  def bucket(seed: String, w: Column): Column =
    substring(md5(to_binary(concat(lit(seed), w), lit("utf-8"))), 1, 3)

  /** One-pass sketch build: every token row contributes one increment
    * per hash row (posexplode over the d bucket columns); map-side
    * combine folds them into ≤ d·4096 keys — a CONSTANT-size shuffle
    * at any corpus size. Returns (j, b, c). Works unchanged on a
    * streaming frame (the aggregation state IS the sketch).
    */
  def sketch(toks: DataFrame, wCol: String): DataFrame =
    toks.select(posexplode(array(
        Seeds.map(s => bucket(s, col(wCol))): _*)).as(Seq("j", "b")))
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("c"))
}
