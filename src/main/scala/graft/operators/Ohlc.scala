package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OHLC bar downsampling: per (key, time bucket), the opening, highest,
  * lowest, and closing value plus volume — THE canonical lossy
  * compaction for telemetry/market series (a million ticks become one
  * bar per interval, preserving what charts and range queries need).
  *
  * 100 TB design: a single map-side-combined groupBy; open/close
  * resolve with `min_by`/`max_by` on the exact (micro timestamp,
  * value) struct — duplicate boundary timestamps deterministically
  * take the smallest value as open and the largest as close, so the
  * bars replay on any engine even when (key, ts) is not unique.
  */
object Ohlc {

  /** (key, bucket, open, high, low, close, n, v_sum): `bucketUs`-wide
    * bars. (key, ts) need not be unique: boundary-timestamp ties break
    * on the value itself (min for open, max for close).
    */
  def bars(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bars: bucketUs must be positive, got $bucketUs")
    val us = unix_micros(col(tsCol))
    df.select(col(keyCol).as("key"), us.as("us"), col(valueCol).as("v"))
      .groupBy(col("key"), expr(s"us div $bucketUs").as("bucket"))
      .agg(
        min_by(col("v"), struct(col("us"), col("v"))).as("open"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        max_by(col("v"), struct(col("us"), col("v"))).as("close"),
        count(lit(1)).as("n"),
        // exact fixed-point volume: double partial-sum order never leaks
        sum(round(col("v") * 100).cast("long")).as("v_centi"))
      .withColumn("v_sum", col("v_centi") / 100.0)
      .drop("v_centi")
  }
}
