package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Bounded broadcast — the [[AsOf.MaxBroadcastRows]] pattern applied to
  * hinted DataFrame broadcasts: a "relatively small" join side (a daily
  * batch, a duplicate-fingerprint set) is still ABSOLUTELY unbounded, and
  * an unconditional `broadcast()` hint ships it whole through the driver
  * to every executor — the standard production OOM.
  *
  * [[bounded]] materializes the frame once (`localCheckpoint`, eager — the
  * row count and the subsequent join read the same blocks, so guarding
  * costs no second lineage execution), counts it, and
  *
  *   - under the cap returns the broadcast-hinted checkpoint: the fast
  *     path, one scan-local hash join on the big side;
  *   - over the cap logs loudly (naming the override knob) and returns the
  *     UN-hinted checkpoint, so Spark plans a shuffle join — correct at
  *     any size, merely not the fast path.
  *
  * Unlike [[AsOf.joinBroadcast]], whose driver-side binary search is only
  * CORRECT when the right side fits on the driver (hence it throws),
  * nothing about a hash join requires the small side to be small — so the
  * over-cap behavior here is an automatic fallback, not an error.
  */
object Broadcasts {

  /** Default row cap, shared with the as-of broadcast bound (~2M rows). */
  val MaxBroadcastRows: Long = AsOf.MaxBroadcastRows.toLong

  def bounded(df: DataFrame, maxRows: Long = MaxBroadcastRows,
              what: String = "broadcast side"): DataFrame = {
    val ck = df.localCheckpoint()
    val n = ck.count()
    if (n <= maxRows) broadcast(ck)
    else {
      System.err.println(
        s"[graft] $what holds $n rows, over the bounded-broadcast cap of " +
          s"$maxRows — falling back to a shuffle join. If this side is " +
          "known to fit in executor memory, raise the maxRows parameter " +
          "of Broadcasts.bounded.")
      ck
    }
  }
}
