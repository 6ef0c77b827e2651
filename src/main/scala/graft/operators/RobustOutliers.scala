package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Median/MAD robust outlier gate (Iglewicz–Hoaglin modified z-score):
  * per group, `z = 0.6745·(x − median) / MAD`, flag |z| > cut (3.5 by
  * convention). Mean/stddev anomaly gates (the engine's X70) break
  * down exactly when needed most — a heavy-tailed metric drags the
  * mean toward its own outliers — while median and MAD have a 50%
  * breakdown point. The standard robust screen for telemetry values,
  * quality scores, and label distributions before they feed training.
  *
  * Scale shape (100 TB): two exact percentile aggregations (median of
  * x, then median of |x − median|) — each one map-side-combined
  * shuffle keyed by group; the per-group medians join back broadcast
  * (|groups| rows). At extreme group cardinality swap the exact
  * percentile for approx_percentile — the shape is unchanged.
  */
object RobustOutliers {

  /** Per-group rollup: (groupCol, n long, med r6, mad r6, n_outliers
    * long, max_abs_z r6 — 0 when MAD = 0, where the score is
    * undefined and no row is flagged) ordered by group.
    */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String,
      cut: Double = 3.5): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = df.join(broadcast(med), groupCol)
    val mad = withMed.groupBy(col(groupCol))
      .agg(expr(s"percentile(abs($valueCol - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), groupCol)
      .withColumn("z",
        when(col("mad") > 0,
          lit(0.6745) * (col(valueCol) - col("med")) / col("mad"))
          .otherwise(lit(0.0)))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(first(col("med")), 6).as("med"),
        round(first(col("mad")), 6).as("mad"),
        sum(when(abs(col("z")) > cut, 1L).otherwise(0L)).as("n_outliers"),
        round(max(abs(col("z"))), 6).as("max_abs_z"))
      .orderBy(col(groupCol))
  }
}
