package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Additive seasonal decomposition of an hourly event series: a
  * centered 25-hour moving-average trend, and the hour-of-day seasonal
  * profile of the detrended remainder (with its dispersion) — the
  * classical decomposition that separates "traffic grows" from "3 AM
  * is always quiet", feeding anomaly baselines and load forecasts.
  *
  * Determinism contract: the trend divides by 25, so the detrended
  * series is kept in EXACT 1/25 units (25·count − windowSum, a long);
  * per-hour-of-day means and variances come from integer moment sums
  * and divide to double once at the end. No float accumulates in any
  * engine-dependent order.
  *
  * Scale shape: the full-resolution data collapses to the per-hour
  * rollup first (map-side combine; frame ∝ calendar span). The moving
  * average is one ordered window on that frame — single-partition
  * here because the demo series is global; per-entity series partition
  * by the entity key with the same code.
  */
object Seasonal {

  /** Hour-of-day profile (hod, n_hours, seasonal, dispersion) of
    * hourly counts of `tsCol`: seasonal = mean detrended count for
    * that hour-of-day (in counts, 1/25-exact), dispersion = its
    * variance from exact moments. Hours without a full ±12-hour
    * neighborhood are excluded (no partial-window bias at the edges).
    */
  def hourOfDayProfile(events: DataFrame, tsCol: String): DataFrame = {
    val hourly = events
      .select(date_trunc("hour", col(tsCol)).as("hr"))
      .groupBy(col("hr")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("hr")).rowsBetween(-12, 12)
    // gaps in the hourly series would silently shrink the frame; the
    // events fixture is dense, and a sparse series should be densified
    // (Resample) first — the full-window filter enforces the contract
    val detrended = hourly
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_sum", sum(col("cnt")).over(w))
      .filter(col("win_n") === 25)
      .select(hour(col("hr")).as("hod"),
        (col("cnt") * 25 - col("win_sum")).as("d25"))
    detrended.groupBy(col("hod"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("d25")).as("s1"), sum(col("d25") * col("d25")).as("s2"))
      .select(col("hod"), col("n_hours"),
        round(col("s1").cast("double") / col("n_hours") / 25.0, 4).as("seasonal"),
        round((col("n_hours") * col("s2") - col("s1") * col("s1")).cast("double")
          / (col("n_hours") * col("n_hours")) / 625.0, 4).as("dispersion"))
      .orderBy(col("hod"))
  }
}
