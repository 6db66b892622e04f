package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log operators: the activity-analytics passes a crawl/usage
 *  pipeline runs beside the content passes. */
object Sessions {

  /** Gap-based sessionization: a user's events split into sessions
   *  wherever the gap to the previous event exceeds `gapMinutes`
   *  (strictly). Returns one row per session: (user_id, session_id
   *  [1-based per user], session_start, session_end, n_events,
   *  duration_sec). Deterministic under timestamp ties: tied events have
   *  gap 0, so they can never open a session, and the per-session
   *  min/max/count aggregates are order-independent — the secondary sort
   *  key only stabilizes the window.
   *
   *  Scale shape: ONE shuffle keyed by user_id; the session-boundary
   *  window (lag + running sum) and the rollup are both per-user, so a
   *  task holds one user's events at a time. Skew note: a 10^8-event bot
   *  user is one partition's sort — for known pathological keys, pre-split
   *  by coarse time bucket first (same operator per bucket, then merge
   *  adjacent sessions across bucket edges); the common path stays one
   *  shuffle. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 userCol: String = "user_id", tsCol: String = "ts",
                 orderCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(orderCol))
    // parquet event logs often carry TIMESTAMP_NTZ; unix_micros needs
    // TIMESTAMP. Graft sessions pin spark.sql.session.timeZone=UTC, so the
    // cast is the identity on the underlying micros (and gap/duration are
    // differences — zone-invariant — either way)
    val tsc = col(tsCol).cast("timestamp")
    // microsecond-exact gap test: unix_micros is the timestamp's native
    // integer representation, so no truncation happens before the compare
    // (second-level unix_timestamp floors each side first and disagrees
    // with any fractional-second engine by ±1 s)
    val brk = when(
      unix_micros(tsc) -
        unix_micros(lag(tsc, 1).over(byUser)) >
        gapMinutes * 60000000L, 1L)
      .otherwise(when(lag(tsc, 1).over(byUser).isNull, 1L)
        .otherwise(0L))
    events
      .withColumn("_brk", brk)
      .withColumn("session_id",
        sum(col("_brk")).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        ((unix_micros(max(tsc)) -
          unix_micros(min(tsc))) / lit(1000000L))
          .cast("long").as("duration_sec"))
  }
}
