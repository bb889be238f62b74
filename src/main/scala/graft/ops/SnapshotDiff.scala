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

  /** SCD2 (slowly-changing-dimension type 2) apply — the warehouse
    * MERGE a versioned corpus catalog runs on every refresh: fold
    * snapshot `toVersion` over the `fromVersion` dimension, emitting
    * one row per (id, content version) with effective-dating —
    * unchanged rows stay open, changed ids close their old row and
    * open a new one, removed ids close, added ids open.
    *
    * Same scale shape as [[diff]]: ONE id-keyed full outer join of the
    * (id, fingerprint) projections — text never rides the exchange —
    * and each joined row expands SCAN-LOCAL into its 1-2 dimension
    * rows (an explode over a conditional array: no second pass, no
    * union of four filtered branches re-reading the join).
    * Returns (id, fp, valid_from, valid_to NULL while open,
    * is_current).
    */
  def scd2(a: DataFrame, b: DataFrame, idCol: String, fpCol: String,
           fromVersion: Int, toVersion: Int): DataFrame = {
    val l = a.select(col(idCol).as("_ida"), col(fpCol).as("_fpa"))
    val r = b.select(col(idCol).as("_idb"), col(fpCol).as("_fpb"))
    def row(fp: org.apache.spark.sql.Column, from: Int,
            to: Option[Int], current: Boolean) =
      struct(fp.as("fp"), lit(from).as("valid_from"),
        to.map(lit(_)).getOrElse(lit(null)).cast("int").as("valid_to"),
        lit(current).as("is_current"))
    l.join(r, col("_ida") === col("_idb"), "full_outer")
      .select(coalesce(col("_ida"), col("_idb")).as(idCol),
        explode(
          when(col("_ida").isNull,
            array(row(col("_fpb"), toVersion, None, current = true)))
          .when(col("_idb").isNull,
            array(row(col("_fpa"), fromVersion, Some(toVersion),
              current = false)))
          .when(col("_fpa") =!= col("_fpb"),
            array(row(col("_fpa"), fromVersion, Some(toVersion),
                current = false),
              row(col("_fpb"), toVersion, None, current = true)))
          .otherwise(
            array(row(col("_fpa"), fromVersion, None, current = true))))
          .as("_v"))
      .select(col(idCol), col("_v.fp"), col("_v.valid_from"),
        col("_v.valid_to"), col("_v.is_current"))
  }
}
