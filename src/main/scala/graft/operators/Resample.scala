package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid resampling with last-observation-carried-forward: turn an
  * irregular event stream into a regular per-key time series (one row
  * per key per grid step between the key's first and last observation),
  * forward-filling each gap with the latest earlier value — the
  * sensor/feature-store regularization that [[AsOfJoin]] performs for
  * a single probe instant, extended to a whole grid.
  *
  * Scale shape: the grid is generated per key with `sequence` + explode
  * (rows ∝ key-span, never a cross join against a global calendar), the
  * last-in-bucket reduction is a per-(key, step) window before the
  * join, and the fill is one `last(ignoreNulls)` window per key in
  * grid order — two hash shuffles on the key, state bounded by a key's
  * grid span. All windows are key-partitioned; nothing global.
  */
object Resample {

  /** Hourly LOCF grid. Input rows: (`keyCol`, `tsCol` timestamp,
    * `valueCol`). Output: (`keyCol`, hr timestamp, value) for every
    * whole hour from each key's first to last event hour, `value` =
    * latest observation at-or-before the grid point (ties within an
    * hour resolve to the latest (ts, `tieCol`)).
    */
  def locfHourly(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val e = events.select(col(keyCol).as("rs_key"),
      date_trunc("hour", col(tsCol)).as("rs_hr"),
      col(tsCol).as("rs_ts"), col(tieCol).as("rs_tie"),
      col(valueCol).as("rs_v"))
    val wBucket = Window.partitionBy(col("rs_key"), col("rs_hr"))
      .orderBy(col("rs_ts").desc, col("rs_tie").desc)
    val lastInBucket = e
      .withColumn("rs_rn", row_number().over(wBucket))
      .filter(col("rs_rn") === 1)
      .select(col("rs_key"), col("rs_hr"), col("rs_v"))
    val grid = e.groupBy(col("rs_key"))
      .agg(min(col("rs_hr")).as("rs_mn"), max(col("rs_hr")).as("rs_mx"))
      .select(col("rs_key"),
        explode(sequence(col("rs_mn"), col("rs_mx"), expr("interval 1 hour")))
          .as("rs_hr"))
    val wFill = Window.partitionBy(col("rs_key")).orderBy(col("rs_hr"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(lastInBucket, Seq("rs_key", "rs_hr"), "left")
      .withColumn("rs_fill", last(col("rs_v"), ignoreNulls = true).over(wFill))
      .select(col("rs_key").as(keyCol), col("rs_hr").as("hr"),
        col("rs_fill").as("value"))
  }
}
