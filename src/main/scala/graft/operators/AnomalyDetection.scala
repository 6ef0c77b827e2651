package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection over a metric stream: bucket the
  * event stream, then score each bucket against the trailing window of
  * the previous `lookback` buckets — the standard drift/spike monitor
  * a data pipeline runs over ingest volume, quality-score averages, or
  * per-source counts to catch a broken upstream before it poisons a
  * training mix (the operational sibling of
  * [[LexicalStats.sourceDrift]]).
  *
  * Determinism: per-bucket totals are exact longs (values scaled by
  * `scale` and floored row-wise, so the sum is order-free), and the
  * rolling moments are integer sums over a ROWS frame; the only float
  * work is the final mean/std/z from those exact integers — identical
  * across engines and re-runs, hence hash-checkable.
  *
  * Scale shape (100 TB): the bucket aggregation is ONE map-side-
  * combined shuffle that collapses the stream to one row per bucket;
  * the window then runs over that tiny series. Partition the window by
  * (source, metric) in multi-tenant use so no single-partition sort
  * appears; the unpartitioned form here is for a single global metric
  * whose bucket count is bounded by the time span, not the data size.
  */
object AnomalyDetection {

  /** Hourly (by default) rolling z-scores for the sum of `valueCol`.
    * Output: (bucket long, total long, z double r4, is_anomaly), one
    * row per bucket with a FULL trailing window, bucket-ordered.
    *
    * @param lookback trailing buckets forming the reference window
    *   (current bucket excluded — a spike must not mask itself).
    * @param threshold |z| above which a bucket is flagged.
    */
  def rollingZScore(events: DataFrame, tsCol: String = "ts",
      valueCol: String = "value", bucketUs: Long = 3600L * 1000000L,
      lookback: Int = 24, scale: Long = 1000L, threshold: Double = 3.0): DataFrame = {
    val buckets = events
      // integer `div`, not `/` (which routes through double and can
      // mis-bucket near 2^53); events here are post-1970 so div = floor
      .select(expr(s"unix_micros($tsCol) div ${bucketUs}L").as("bucket"),
        floor(col(valueCol) * scale).cast("long").as("v"))
      .groupBy(col("bucket")).agg(sum(col("v")).as("total"))
    val w = Window.orderBy(col("bucket")).rowsBetween(-lookback, -1)
    val n = lit(lookback.toLong)
    buckets
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s1", sum(col("total")).over(w))
      .withColumn("s2", sum(col("total") * col("total")).over(w))
      .filter(col("cnt") === lookback)
      // ANSI mode throws on /0 even for doubles: a constant reference
      // window (variance 0) must yield z = null, flagged iff the new
      // bucket departs from the constant at all
      .withColumn("_d2", col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double") / n.cast("double"))
      .withColumn("z", when(col("_d2") > 0, round(
        (col("total").cast("double") - col("s1").cast("double") / n.cast("double")) /
          sqrt(col("_d2") / lit((lookback - 1).toDouble)), 4)))
      .withColumn("is_anomaly", when(col("_d2") > 0, abs(col("z")) > threshold)
        .otherwise(col("total") * n =!= col("s1")))
      .select(col("bucket"), col("total"), col("z"), col("is_anomaly"))
      .orderBy(col("bucket"))
  }
}
