package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention over an event log: users grouped by the time bucket
  * of their first `cohortType` event, counted distinct in each later
  * activity bucket — the companion report to [[Funnel]] (funnel = does a
  * user convert; retention = does a user come back).
  *
  * 100 TB design: activity reduces to DISTINCT (user, bucket) pairs
  * FIRST (map-side combined — collapses the event volume to at most
  * users × buckets rows) before joining the one-row-per-user cohort
  * table; bucket arithmetic is exact integer floor-division on
  * microseconds, so there is no float (or timezone) path anywhere.
  */
object Retention {

  /** (cohort_bucket, bucket_offset, n_users) with offset ≥ 0, distinct
    * users, buckets of `bucketUs` microseconds (default one week).
    */
  def cohorts(events: DataFrame, cohortType: String = "signup",
      userCol: String = "user_id", typeCol: String = "event_type", tsCol: String = "ts",
      bucketUs: Long = 7L * 86400L * 1000000L): DataFrame = {
    // FLOOR division, not `div` (which truncates toward zero): pre-1970
    // timestamps have negative epoch micros, and a truncating bucket
    // would both disagree with floor-division engines and straddle the
    // epoch with a double-width bucket.
    def bucketOf(name: String): Column = {
      val us = col(name)
      expr(s"$name div $bucketUs") -
        when(us < 0 && pmod(us, lit(bucketUs)) =!= 0, 1L).otherwise(0L)
    }
    val e = events.select(col(userCol).as("user"), col(typeCol).as("typ"),
      unix_micros(col(tsCol)).as("us"))
    val cohort = e.filter(col("typ") === cohortType)
      .groupBy(col("user")).agg(min(col("us")).as("su"))
      .select(col("user"), bucketOf("su").as("cohort_bucket"))
    val activity = e
      .select(col("user"), bucketOf("us").as("bucket"))
      .distinct()
    activity.join(cohort, Seq("user"))
      .select(col("cohort_bucket"), (col("bucket") - col("cohort_bucket")).as("bucket_offset"),
        col("user"))
      .filter(col("bucket_offset") >= 0)
      .groupBy(col("cohort_bucket"), col("bucket_offset"))
      .agg(count_distinct(col("user")).as("n_users"))
  }
}
