package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: a new session starts when
  * the gap to the previous event of the same user exceeds `gapSeconds`.
  *
  * Classic lag + cumulative-sum-of-boundaries formulation: one shuffle on
  * userId, then two windows over the same partitioning (Spark reuses the
  * sort). Scales linearly — per-user state only.
  */
object Sessionize {

  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, tieCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_millis(col(tsCol)) - unix_millis(col("_prev_ts")) > gapSeconds * 1000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("_new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_ts", "_new_session")
  }

  /** Gap-based sessions ADDITIONALLY split every `capSeconds` from the
    * gap-session's start — the max-duration policy (a "session" left
    * open for a week is a bug, not engagement). The cap slices
    * relative to the gap-session start (sub = ⌊(t − start)/cap⌋), so
    * the split stays a pure window expression — one user shuffle, no
    * sequential state — and replays on any engine. Output adds
    * `session_sub` and a composite `session_id` = seq·10⁶ + sub.
    */
  def sessionizeCapped(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, capSeconds: Long, tieCol: String = "event_id"): DataFrame = {
    require(capSeconds > 0, s"sessionizeCapped: capSeconds=$capSeconds must be positive")
    val bySession = Window.partitionBy(col(userCol), col("session_seq"))
    sessionize(events, userCol, tsCol, gapSeconds, tieCol)
      .withColumn("_sess_start", min(unix_millis(col(tsCol))).over(bySession))
      .withColumn("session_sub",
        expr(s"(unix_millis($tsCol) - _sess_start) div ${capSeconds * 1000L}"))
      .withColumn("session_id", col("session_seq") * 1000000L + col("session_sub"))
      .drop("_sess_start")
  }

  /** Per-session rollup: bounds, event count, summed value. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, valueCol: String): DataFrame =
    sessionize(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol)).as("session_value"))
}
