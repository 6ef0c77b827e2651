package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Growth accounting: classify every (user, period) as new / retained /
  * resurrected, and count churn — the standard DAU/WAU/MAU
  * decomposition (new + retained + resurrected = active; churned =
  * previous active − retained) every growth team reports.
  *
  * 100 TB design: activity collapses to distinct (user, period) first
  * (map-side combine), then ONE lag window per user computes both
  * "active last period" and "first period" — no self-join of activity
  * against itself; the per-period rollup is a second small aggregate.
  * Churn attributes to the period AFTER the activity, via the same lag
  * frame read forward.
  */
object GrowthAccounting {

  /** Per-period rollup (period, n_new, n_retained, n_resurrected,
    * n_churned, n_active) from events with a user and timestamp;
    * periods are `periodUs`-wide epoch buckets. Churn rows appear for
    * the period right after the user's activity gap begins (the last
    * observed period emits no churn — unknowable until it closes).
    */
  def report(events: DataFrame, userCol: String, tsCol: String,
      periodUs: Long): DataFrame = {
    require(periodUs > 0, s"report: periodUs must be positive, got $periodUs")
    val act = events
      .select(col(userCol).as("user"),
        expr(s"unix_micros(${tsCol}) div $periodUs").as("period"))
      .distinct()
    val w = Window.partitionBy(col("user")).orderBy(col("period"))
    val tagged = act
      .withColumn("prev", lag(col("period"), 1).over(w))
      .withColumn("state",
        when(col("prev").isNull, "new")
          .when(col("prev") === col("period") - 1, "retained")
          .otherwise("resurrected"))
    val active = tagged.groupBy(col("period"))
      .agg(
        sum(when(col("state") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("state") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("state") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        count(lit(1)).as("n_active"))
    // churned in period p+1: active in p, not active in p+1
    val churn = tagged
      .withColumn("next", lead(col("period"), 1).over(w))
      .filter(col("next").isNull || col("next") > col("period") + 1)
      .groupBy((col("period") + 1).as("period"))
      .agg(count(lit(1)).as("n_churned"))
    val maxPeriod = active.agg(max(col("period"))).head().getLong(0)
    // FULL outer: a period with zero activity (a total gap) still owns
    // the churn of everyone whose gap opened into it — a left join from
    // `active` would silently drop that row
    active.join(churn, Seq("period"), "full_outer")
      .na.fill(0L, Seq("n_new", "n_retained", "n_resurrected", "n_churned", "n_active"))
      // the period after the horizon would be all-churn noise; and the
      // last observed period's own churn IS defined (users whose next
      // activity never comes) — but only below the horizon
      .filter(col("period") <= maxPeriod)
  }
}
