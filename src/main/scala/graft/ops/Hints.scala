package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-hint guards. */
object Hints {

  /** Broadcast row-count ceiling for skew-gate lists. Rows on these
    * frames are a handful of longs (~40 B incl. overhead), so 4M rows
    * ≈ 160 MB — inside the driver/broadcast comfort zone with margin,
    * far under the 8 GB hard limit.
    */
  val DefaultMaxBroadcastRows: Long = 4L * 1000 * 1000

  /** Broadcast `df` only if its materialized row count is ≤ `maxRows`;
    * otherwise return it UNhinted so the join degrades gracefully to a
    * shuffle join instead of failing the job / OOMing the driver on a
    * pathological input (ADVICE r6 #4: the "tiny by construction" bound
    * |banded|/cap is tiny in the common case, not in every case).
    *
    * The count is one small job. Callers pass a PERSISTED frame, so the
    * count doubles as the cache fill that the frame's join consumers
    * then reuse — same total work, one extra scheduling round-trip.
    * Hints survive projections (`EliminateResolvedHint` looks through
    * Project/Filter), so `guardedBroadcast(df).select(...)` keeps the
    * hint on the join side.
    */
  def guardedBroadcast(df: DataFrame,
                       maxRows: Long = DefaultMaxBroadcastRows): DataFrame =
    if (df.count() <= maxRows) broadcast(df) else df
}
