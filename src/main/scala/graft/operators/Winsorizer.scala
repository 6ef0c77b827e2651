package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group winsorization: clip a numeric column to its group's
  * [pLo, pHi] exact percentiles — the standard heavy-tail taming step
  * before means/regressions that [[RobustOutliers]]' median/MAD gate
  * complements (that one flags rows, this one repairs values).
  *
  * Scale shape: bounds come from ONE aggregate over the group key
  * (group-count rows out), broadcast back onto the fact — no window
  * over the full input, no global sort. Exact `percentile` buffers
  * each group's values in the aggregate; at 100 TB swap in
  * `approx_percentile` (same plan shape, sketch-sized state) — the
  * clip join and everything downstream is unchanged.
  */
object Winsorizer {

  /** `df` plus `<valueCol>_w` (the clipped value) and the group's
    * `w_lo` / `w_hi` bounds (rounded to `roundScale` decimals so the
    * clip threshold is reproducible across engines).
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95, roundScale: Int = 2): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentile range [$pLo, $pHi]")
    val bounds = df.groupBy(col(groupCol)).agg(
      round(percentile(col(valueCol), lit(pLo)), roundScale).as("w_lo"),
      round(percentile(col(valueCol), lit(pHi)), roundScale).as("w_hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(valueCol + "_w",
        least(greatest(col(valueCol), col("w_lo")), col("w_hi")))
  }
}
