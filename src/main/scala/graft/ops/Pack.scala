package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the standard LLM-pretraining
  * batching shape: within each shard, documents are laid head-to-tail in
  * a deterministic order and the token stream is cut every `budget`
  * tokens; a document is assigned the chunk where its FIRST token lands
  * (start-offset attribution, so boundary-straddling documents belong to
  * their starting chunk).
  *
  * Scale shape: ONE shuffle (the window partition on the shard column)
  * and a running O(n) cumulative-sum frame per shard. The shard column
  * (language, source bucket, hash stripe) is what bounds partition size
  * at 100 TB — pack within shards, never over a global order, which
  * would be a single-partition sort. Chunk arithmetic is integer `div`
  * on BIGINT cumulative sums: exact at any corpus size (a double divide
  * would lose precision past 2^53 total tokens).
  */
object Pack {

  /** Adds `chunk_id` (0-based per shard). `tokensCol` must be an
    * integral column; ordering ties on `orderCol` must not exist (use a
    * unique id) or the cumsum is nondeterministic.
    */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
                    tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokensCol).cast("long")).over(w))
      .withColumn("chunk_id",
        expr(s"(_cum - CAST($tokensCol AS BIGINT)) div ${budget}L"))
      .drop("_cum")
  }
}
