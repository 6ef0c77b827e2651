package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort lifetime-value curve: users grouped by signup week, revenue
  * accumulated by cohort age — the value-weighted counterpart of
  * [[Retention]]'s activity curve (does the week-3 cohort SPEND more,
  * not just come back more).
  *
  * Scale shape: two filtered aggregates of the event stream (cohort
  * assignment = min signup per user, revenue = per (user, week)
  * rollup), one equi-join on the user key, then a rollup to the tiny
  * (cohort, age) grid; the cumulative window runs on that grid, never
  * on events. Week arithmetic is integer epoch-week division; value
  * sums are exact micros.
  */
object CohortLtv {

  private val WeekUs = 7L * 86400L * 1000000L

  /** (cohort_week, age_weeks, n_buyers, rev_us, cum_rev_us): revenue
    * of `revenueType` events by signup-cohort week and weeks-since-
    * signup; purchases before the signup (or by users who never signed
    * up) are excluded.
    */
  def weeklyLtv(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, valueCol: String,
      cohortType: String = "signup", revenueType: String = "purchase"): DataFrame = {
    val e = events.select(col(userCol).as("user"), col(typeCol).as("typ"),
      unix_micros(col(tsCol)).as("us"),
      round(col(valueCol) * 1000000).cast("long").as("val_us"))
    val cohort = e.filter(col("typ") === cohortType)
      .groupBy(col("user")).agg(min(col("us")).as("su"))
      .select(col("user"), expr(s"su div $WeekUs").as("cohort_week"))
    val revenue = e.filter(col("typ") === revenueType)
      .select(col("user"), expr(s"us div $WeekUs").as("rev_week"), col("val_us"))
    val grid = revenue.join(cohort, Seq("user"))
      .withColumn("age_weeks", col("rev_week") - col("cohort_week"))
      .filter(col("age_weeks") >= 0)
      .groupBy(col("cohort_week"), col("age_weeks"))
      .agg(countDistinct(col("user")).as("n_buyers"), sum(col("val_us")).as("rev_us"))
    val wCum = Window.partitionBy(col("cohort_week")).orderBy(col("age_weeks"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.withColumn("cum_rev_us", sum(col("rev_us")).over(wCum))
  }
}
