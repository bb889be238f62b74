package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Shard
import graft.text.TextOps

/** Training-data curation batch twenty-six — capacity planning: shard
  * balance (q167: the exact integer Gini coefficient and straggler
  * ratio over the q65 shard manifest — a perfectly uniform sharding
  * reads Gini 0, and the slowest task of every downstream stage is the
  * max/mean ratio away from the mean, so this one row IS the
  * wall-clock risk number for the shard layout), and the vocabulary
  * growth curve (q168: cumulative distinct vocabulary at each tenth of
  * the doc-id span — the Heaps'-law evidence a tokenizer/vocab-size
  * decision reads; a flattening curve says the corpus stopped
  * contributing new types, a linear one says the vocab budget is
  * undersized).
  */
object Pipeline26 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------ q167
  // Shard-balance audit: over the q65 manifest's 16 token totals, the
  // exact Gini coefficient (sum of |x_i - x_j| over 2·n·sum(x), all
  // integers, half-away micro rounding) and the straggler ratio
  // (n·max/sum — how much longer the fattest shard runs than the
  // average). Scale shape: the manifest is |shards| rows, the pairwise
  // |x_i - x_j| is a |shards|² self-join of a bounded table, and the
  // corpus-sized work (the manifest itself) is q65's one aggregate.
  private val GiniShards = 16

  private val q167: Q = (s, d) => {
    val m = Shard.manifest(FeatureMemo.features(s, d), "doc_id",
        col("n_tokens_ws"), col("fp"), GiniShards)
      .select(col("shard_id"), col("total_tokens"))
      .localCheckpoint() // the totals feed a self-join + two aggregates
    val pairs = m.select(col("total_tokens").as("xa")).crossJoin(
        m.select(col("total_tokens").as("xb")))
      .agg(sum(abs(col("xa") - col("xb"))).as("sdiff"))
    m.agg(count(lit(1)).as("n_shards"),
        sum(col("total_tokens")).as("total_tokens"),
        min(col("total_tokens")).as("min_tokens"),
        max(col("total_tokens")).as("max_tokens"))
      .crossJoin(broadcast(pairs))
      // sdiff·10^6 and n_shards·total_tokens·10^6 overflow BIGINT once
      // the corpus carries ~10^12 tokens — DECIMAL(38)/HUGEINT per the
      // house rule (Spark would wrap silently where DuckDB raises)
      .select(col("n_shards"), col("total_tokens"),
        col("min_tokens"), col("max_tokens"),
        (expr("CAST((2 * CAST(sdiff AS DECIMAL(38,0)) * 1000000" +
          " + 2 * CAST(n_shards AS DECIMAL(38,0)) * total_tokens) div " +
          "(2 * (2 * CAST(n_shards AS DECIMAL(38,0)) * total_tokens)) AS BIGINT)")
          / 1e6).as("gini"),
        (expr("CAST((2 * CAST(n_shards AS DECIMAL(38,0)) * max_tokens * 1000000" +
          " + total_tokens) div " +
          "(2 * CAST(total_tokens AS DECIMAL(38,0))) AS BIGINT)") / 1e6)
          .as("straggler_ratio"))
  }

  private lazy val q167Sql = {
    val from = s"""SELECT doc_id,
        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(string_split_regex(trim(text), '\\s+'))
             END AS BIGINT) AS toks,
        md5(${OracleSql.normSql}) AS fp
      FROM documents"""
    s"""
    WITH ${Shard.manifestSql(from, "doc_id", GiniShards)},
    t AS (SELECT shard_id, total_tokens FROM manifest_),
    pd AS (SELECT CAST(sum(abs(a.total_tokens - b.total_tokens))
             AS BIGINT) AS sdiff
           FROM t a, t b),
    ag AS (SELECT CAST(count(*) AS BIGINT) AS n_shards,
             CAST(sum(total_tokens) AS BIGINT) AS total_tokens,
             CAST(min(total_tokens) AS BIGINT) AS min_tokens,
             CAST(max(total_tokens) AS BIGINT) AS max_tokens
           FROM t)
    SELECT n_shards, total_tokens, min_tokens, max_tokens,
           CAST((2 * CAST(sdiff AS HUGEINT) * 1000000
               + 2 * CAST(n_shards AS HUGEINT) * total_tokens) //
            (2 * (2 * CAST(n_shards AS HUGEINT) * total_tokens)) AS BIGINT)
             / 1e6 AS gini,
           CAST((2 * CAST(n_shards AS HUGEINT) * max_tokens * 1000000
               + total_tokens) //
            (2 * CAST(total_tokens AS HUGEINT)) AS BIGINT) / 1e6
             AS straggler_ratio
    FROM ag, pd"""
  }

  // ------------------------------------------------------------------ q168
  // Vocabulary growth curve: the doc-id span split into ten equal
  // ranges (the deterministic, scale-free ingestion-order proxy — a
  // COUNT-decile split would need a corpus-wide rank, which is exactly
  // the global sort the house bans; the id-span split assigns each
  // doc its bucket scan-locally off one broadcast min/max row), then
  // per bucket: docs, cumulative tokens, cumulative distinct
  // vocabulary (a term counts at its FIRST bucket — min(bucket) per
  // term, a vocab-bounded aggregate), and the new-type fraction.
  // Scale shape: one token explode into a vocab-bounded min-aggregate;
  // every window below runs over TEN rows.
  private val GrowthBuckets = 10

  private val q168: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = GramMemo.words(s, d)
    val bounds = w.agg(min(col("doc_id")).as("mn"),
      (max(col("doc_id")) - min(col("doc_id")) + 1).as("span"))
    val bucketed = w.crossJoin(broadcast(bounds))
      .withColumn("b", least(lit(GrowthBuckets - 1),
        expr(s"((doc_id - mn) * $GrowthBuckets) div span")))
    val perB = bucketed.groupBy(col("b"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("words"))).cast("long").as("n_tokens"))
    val firstB = bucketed
      .select(col("b"), explode(col("words")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(min(col("b")).as("fb"))
      .groupBy(col("fb")).agg(count(lit(1)).as("new_types"))
    val wc = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perB.join(firstB.withColumnRenamed("fb", "b"), Seq("b"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("cum_docs", sum(col("n_docs")).over(wc))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wc))
      .withColumn("cum_vocab", sum(col("new_types")).over(wc))
      .select(col("b").cast("long").as("bucket"), col("cum_docs"),
        col("cum_tokens"), col("new_types"), col("cum_vocab"),
        round(col("cum_vocab").cast("double") / col("cum_tokens"), 6)
          .as("type_token_ratio"))
      .orderBy(col("bucket"))
  }

  private lazy val q168Sql = s"""
    WITH nd AS (SELECT doc_id, string_split(${OracleSql.normSql}, ' ')
                  AS ws
                FROM documents),
    bounds AS (SELECT min(doc_id) AS mn,
                 max(doc_id) - min(doc_id) + 1 AS span FROM nd),
    bk AS (SELECT doc_id, ws,
             least(${GrowthBuckets - 1},
               ((doc_id - mn) * $GrowthBuckets) // span) AS b
           FROM nd, bounds),
    perb AS (SELECT b, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(ws)) AS BIGINT) AS n_tokens
             FROM bk GROUP BY b),
    fb AS (SELECT w, min(b) AS fb FROM
             (SELECT b, unnest(ws) AS w FROM bk)
           WHERE length(w) > 0 GROUP BY w),
    nt AS (SELECT fb AS b, CAST(count(*) AS BIGINT) AS new_types
           FROM fb GROUP BY fb),
    cum AS (SELECT perb.b, n_docs, n_tokens,
              coalesce(nt.new_types, 0) AS new_types,
              sum(n_docs) OVER (ORDER BY perb.b) AS cum_docs,
              sum(n_tokens) OVER (ORDER BY perb.b) AS cum_tokens,
              sum(coalesce(nt.new_types, 0)) OVER (ORDER BY perb.b)
                AS cum_vocab
            FROM perb LEFT JOIN nt ON nt.b = perb.b)
    SELECT CAST(b AS BIGINT) AS bucket,
           CAST(cum_docs AS BIGINT) AS cum_docs,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(new_types AS BIGINT) AS new_types,
           CAST(cum_vocab AS BIGINT) AS cum_vocab,
           round(CAST(cum_vocab AS DOUBLE) / cum_tokens, 6)
             AS type_token_ratio
    FROM cum ORDER BY bucket"""

  val queries: Map[String, Q] = Map(
    "q167_shard_gini" -> q167,
    "q168_vocab_growth" -> q168)

  val oracleSql: Map[String, String] = Map(
    "q167_shard_gini" -> q167Sql,
    "q168_vocab_growth" -> q168Sql)
}
