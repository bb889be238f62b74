package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic output sharding — the training-data WRITER's last step:
  * every document gets a shard (16-bit key hash mod `nShards`) and the
  * shard gets a verifiable manifest row (doc count, token count, and a
  * content digest over the shard's members in deterministic order).
  *
  * Why hash-of-key and not `repartition`: Spark's round-robin/hash
  * repartitioning depends on the partition layout of the input, so two
  * runs (or two engines) can produce different shard membership.
  * md5-derived shards are a pure row function — byte-stable anywhere,
  * which is what makes the manifest digest auditable at all (the digest
  * chain is how a 100 TB pipeline proves a re-run reproduced the same
  * corpus: compare 16 manifest rows, not 100 TB of bytes).
  *
  * Plan shape: scan-local shard/fingerprint expressions, then ONE shuffle
  * (the groupBy on shard) whose reduce side sorts each shard's
  * fingerprint list. A shard's member list is collected into memory to
  * digest it — shards are FILE-sized by construction (you pick nShards so
  * a shard is a few hundred MB), so the list is bounded the same way a
  * real writer's output file is; corpus growth grows nShards, not the
  * per-shard list.
  */
object Shard {

  /** Shard id: first 4 hex chars of md5(key) — 65536 equiprobable
    * buckets, folded mod nShards (the fold bias at 65536/nShards is
    * ≤ nShards/65536, irrelevant for file sizing; determinism is what
    * matters). Mirrors [[Sample.bucket]]'s keying.
    */
  def shardOf(key: Column, nShards: Int): Column =
    pmod(conv(substring(md5(to_binary(key.cast("string"), lit("utf-8"))),
      1, 4), 16, 10).cast("int"), lit(nShards))

  /** DuckDB mirror of [[shardOf]]. */
  def shardOfSql(keyCol: String, nShards: Int): String =
    s"CAST('0x' || substr(md5(CAST($keyCol AS VARCHAR)), 1, 4) AS INTEGER)" +
      s" % $nShards"

  /** Per-shard manifest: `shard_id, n_docs, total_tokens, shard_fp` where
    * shard_fp = md5 of the member fingerprints concatenated in
    * (fingerprint, key) order — order-insensitive to the shuffle, total
    * (a duplicate fingerprint pair is ordered by key).
    */
  def manifest(df: DataFrame, keyCol: String, toks: Column, fp: Column,
               nShards: Int): DataFrame =
    df.select(col(keyCol).as("_k"), toks.as("_toks"), fp.as("_fp"),
        shardOf(col(keyCol), nShards).as("shard_id"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_toks")).as("total_tokens"),
        md5(to_binary(array_join(transform(
          sort_array(collect_list(struct(col("_fp"), col("_k")))),
          e => e.getField("_fp")), ""), lit("utf-8"))).as("shard_fp"))

  /** DuckDB mirror of [[manifest]] over `fromSql` yielding
    * (key, toks, fp) — a CTE chain ending in `manifest_`.
    */
  def manifestSql(fromSql: String, keyCol: String, nShards: Int): String = s"""
    rows_ AS ($fromSql),
    manifest_ AS (
      SELECT ${shardOfSql(keyCol, nShards)} AS shard_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS total_tokens,
             md5(string_agg(fp, '' ORDER BY fp, $keyCol)) AS shard_fp
      FROM rows_ GROUP BY 1)"""
}
