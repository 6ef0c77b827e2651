package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted average (TWAP): each observation holds its value until
  * the key's next observation; the average weights every value by its
  * holding time — the correct aggregate for irregularly-sampled series
  * (sensor states, prices, feature-store values), where a plain mean
  * over-counts bursts. The last observation has no holding interval and
  * is excluded (standard closed-open convention).
  *
  * 100 TB design: one shuffle on the key, one lead window, one
  * map-side-combined groupBy on the SAME key partitioning (no second
  * exchange). Exactness: values ride as centi-units (long), holding
  * times as exact micros; their products accumulate in DECIMAL(38,0),
  * so the weighted sum is summation-order-free — the final double
  * appears only in the one closing division.
  */
object TimeWeightedAverage {

  /** (key, n_intervals, span_us, twap): time-weighted mean of `valueCol`
    * per key, `twap` in the value's original units rounded to 6 places.
    */
  def twap(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("us"))
    val us = unix_micros(col(tsCol))
    df
      .select(col(keyCol), us.as("us"),
        round(col(valueCol) * 100).cast("long").as("v_centi"))
      .withColumn("dt_us", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dt_us").isNotNull)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dt_us")).as("span_us"),
        // lift to decimal BEFORE the product: centi-value × micro-gap
        // can exceed 2^63 under ANSI long arithmetic
        sum(col("v_centi").cast("decimal(38,0)") * col("dt_us")).as("wsum"))
      .select(col(keyCol), col("n_intervals"), col("span_us"),
        round(col("wsum").cast("double") / 100.0 / col("span_us").cast("double"), 6)
          .as("twap"))
  }
}
