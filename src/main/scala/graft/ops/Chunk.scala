package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Overlapping fixed-size word-window chunking — the RAG/embedding
  * ingestion shape: each document becomes ceil((n-W)/S)+1 chunks of at
  * most `window` words starting every `stride` words, so consecutive
  * chunks share `window - stride` words of context.
  *
  * Scale shape: scan-local — the chunk count and every slice derive
  * from the row's own word array (explode of a per-row integer
  * sequence), so chunking runs at scan speed with no shuffle and no
  * state. Output size is input tokens × (window/stride) — the caller
  * chooses the overlap factor knowing it multiplies bytes written.
  */
object Chunk {

  /** Number of chunks for `nWords` words: 1 when everything fits, else
    * first-start-past-coverage arithmetic, all integral (exact at any
    * size). Column form over an INT word count.
    */
  def nChunks(nWords: Column, window: Int, stride: Int): Column =
    when(nWords <= window, lit(1))
      .otherwise(floor((nWords - window + (stride - 1)) / stride).cast("int") + 1)

  /** Explodes `textCol` into (chunk_idx, chunk) rows where chunk is the
    * word-array slice [chunk_idx*stride, +window). Words come from
    * whitespace-normalized text. All other columns pass through.
    *
    * Null contract: a NULL text yields one row with chunk_idx 0 and a
    * NULL chunk (null propagates through the slice), mirroring how a
    * null word array would behave — callers filter or coalesce as their
    * pipeline requires.
    */
  def chunkWords(df: DataFrame, textCol: String,
                 window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    df.withColumn("_w", split(TextOps.normalize(col(textCol)), " "))
      .withColumn("chunk_idx",
        explode(sequence(lit(0), nChunks(size(col("_w")), window, stride) - 1)))
      .withColumn("chunk",
        slice(col("_w"), col("chunk_idx") * stride + 1, lit(window)))
      .drop("_w")
  }
}
