package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM change-point detection on a daily count series: the day where
  * the cumulative deviation from the global mean peaks — "when did the
  * level shift" — complementing [[AnomalyDetection]] (which flags
  * single outlier days) and [[KsTest]] (which compares two unordered
  * samples) with the time-ordered structural-break question.
  *
  * Determinism contract: the mean is never materialized as a float —
  * the statistic is scaled by n (C_k = Σ_{i≤k} (n·xᵢ − T), T = total),
  * so the whole argmax search is exact integer arithmetic; ties break
  * to the earliest day. One double division normalizes at the end.
  *
  * Scale shape: the full-resolution stream collapses to the per-day
  * rollup first; the cumulative window runs on calendar-span rows.
  * Per-series detection partitions the same window by the series key.
  */
object ChangePoint {

  /** One row (n_days, total, cp_day, c_scaled, stat): the argmax of
    * |C_k| over the daily-count CUSUM of `tsCol`, with
    * stat = |C|/(n·T) ∈ [0, ~¼] as the normalized break strength.
    */
  def cusumDaily(events: DataFrame, tsCol: String): DataFrame = {
    val perDay = events.select(to_date(col(tsCol)).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("x"))
    val totals = perDay.agg(count(lit(1)).as("n_days"), sum(col("x")).as("total"))
    val wCum = Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, 0)
    perDay.crossJoin(broadcast(totals))
      .withColumn("c", sum(col("x") * col("n_days") - col("total")).over(wCum))
      .orderBy(abs(col("c")).desc, col("d"))
      .limit(1)
      .select(col("n_days"), col("total"), col("d").as("cp_day"),
        abs(col("c")).as("c_scaled"),
        round(abs(col("c")).cast("double") /
          (col("n_days") * col("total").cast("double")), 6).as("stat"))
  }
}
