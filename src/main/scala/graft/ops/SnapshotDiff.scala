package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the observability op a continuously-refreshed
  * training corpus publishes between crawl N and crawl N+1: which
  * documents were added, removed, changed (same id, different content
  * fingerprint), or untouched. Downstream consumers (index rebuilds,
  * incremental dedup, eval decontamination) subscribe to the delta
  * instead of re-reading the snapshot.
  *
  * Scale shape: ONE id-keyed full outer join of the two (id,
  * fingerprint) projections — fingerprints computed scan-local, the
  * join shuffles 16-byte digests plus ids, never document text; with
  * both snapshots bucketed by id on storage the exchange disappears
  * entirely. Content equality by fingerprint keeps the compare O(1)
  * per row at any document size.
  */
object SnapshotDiff {

  /** (id, status) for every id in either snapshot; `status` in
    * {added, removed, changed, unchanged} (added = new-side only).
    * `a`/`b` are the old/new (id, fingerprint) projections.
    */
  def diff(a: DataFrame, b: DataFrame, idCol: String,
           fpCol: String): DataFrame = {
    val l = a.select(col(idCol).as("_ida"), col(fpCol).as("_fpa"))
    val r = b.select(col(idCol).as("_idb"), col(fpCol).as("_fpb"))
    l.join(r, col("_ida") === col("_idb"), "full_outer")
      .select(coalesce(col("_ida"), col("_idb")).as(idCol),
        when(col("_ida").isNull, lit("added"))
          .when(col("_idb").isNull, lit("removed"))
          .when(col("_fpa") =!= col("_fpb"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
