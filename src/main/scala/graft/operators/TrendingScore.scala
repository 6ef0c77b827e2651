package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponentially-decayed activity scoring ("trending"): each event
  * contributes `2^-age_days`, so yesterday counts half of today — the
  * standard recency-weighted popularity rank for feeds, crawl
  * prioritization, and hot-key detection. The half-life-in-days form
  * makes every weight a DYADIC rational, and scaling by `2^maxAge`
  * turns them into exact LONGS — the whole score is integer
  * arithmetic, order-free and engine-exact, where the usual
  * `pow(0.5, age)` float sum is neither.
  *
  * Scale shape (100 TB): one map-side-combined shuffle per key (the
  * weight is computed row-side from the event time and the broadcast
  * corpus max); top-k is a TakeOrderedAndProject. Events older than
  * `maxAgeDays` weigh exactly 0 and can be partition-pruned out
  * before the scan at the source level.
  */
object TrendingScore {

  /** Top-`k` keys by decayed score. Output: (rk int, key, n_events
    * long, score long) where score = Σ 2^(maxAgeDays - age_days),
    * i.e. 2^maxAgeDays ≡ weight 1.0 for a today-event.
    */
  def topDecayed(events: DataFrame, keyCol: String, tsCol: String = "ts",
      k: Int = 20, maxAgeDays: Int = 40): DataFrame = {
    require(maxAgeDays >= 1 && maxAgeDays <= 62)
    val us = events.select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("us"))
    val mx = us.agg(max(col("us")).as("mx_us"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("key").asc)
    us.crossJoin(broadcast(mx))
      .withColumn("age", expr("(mx_us - us) div 86400000000"))
      .filter(col("age") < maxAgeDays)
      .withColumn("wt", expr(s"shiftleft(CAST(1 AS BIGINT), CAST($maxAgeDays - age AS INT))"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_events"), sum(col("wt")).as("score"))
      .orderBy(col("score").desc, col("key").asc).limit(k)
      .withColumn("rk", row_number().over(w))
      .select(col("rk"), col("key"), col("n_events"), col("score"))
  }
}
