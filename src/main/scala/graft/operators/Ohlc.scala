package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OHLC bar downsampling: per (key, time bucket), the opening, highest,
  * lowest, and closing value plus volume — THE canonical lossy
  * compaction for telemetry/market series (a million ticks become one
  * bar per interval, preserving what charts and range queries need).
  *
  * 100 TB design: a single map-side-combined groupBy; open/close
  * resolve with `min_by`/`max_by` on the exact micro timestamp (no
  * window, no sort, no second shuffle). Ties on the boundary timestamp
  * are broken by the tie column to stay deterministic on any engine.
  */
object Ohlc {

  /** (key, bucket, open, high, low, close, n, v_sum): `bucketUs`-wide
    * bars. Assumes (key, ts) unique (true of the events fixture);
    * otherwise pre-aggregate ties.
    */
  def bars(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bars: bucketUs must be positive, got $bucketUs")
    val us = unix_micros(col(tsCol))
    df.select(col(keyCol).as("key"), us.as("us"), col(valueCol).as("v"))
      .groupBy(col("key"), expr(s"us div $bucketUs").as("bucket"))
      .agg(
        min_by(col("v"), col("us")).as("open"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        max_by(col("v"), col("us")).as("close"),
        count(lit(1)).as("n"),
        // exact fixed-point volume: double partial-sum order never leaks
        sum(round(col("v") * 100).cast("long")).as("v_centi"))
      .withColumn("v_sum", col("v_centi") / 100.0)
      .drop("v_centi")
  }
}
