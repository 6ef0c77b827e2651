package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budget-constrained corpus selection: order candidates by
  * value-per-cost and keep the maximal prefix whose cumulative cost
  * fits the budget — the fractional-knapsack greedy (minus the
  * fractional last item) that data-selection pipelines run to pick
  * "the best N billion tokens" from a scored pool. Value and cost are
  * exact longs; the ratio is ONE division of those longs, so the
  * ordering — and therefore the selected set — replays bit-identically
  * on any engine.
  *
  * Scale shape (100 TB): the running total is computed WITHOUT a
  * global sort of the candidates. Rows are range-bucketed on sampled
  * ratio quantiles (equal ratios always share a bucket, so buckets
  * strictly respect the ratio-desc global order); one map-side-combined
  * aggregate yields per-bucket cost totals (≤ a few dozen rows), a
  * window over that TINY frame turns them into exclusive prefix
  * offsets, and each bucket then computes its internal running sum in
  * parallel under `partitionBy(bucket)` — cum_cost = bucket offset +
  * within-bucket prefix, exactly the global prefix sum because bucket
  * order is total. Buckets whose offset already exceeds the budget are
  * pruned before their window runs: only the selected prefix and the
  * single boundary bucket do any window work. The [[Skyline]] pass-1
  * pattern, applied to prefix sums.
  */
object BudgetSelection {

  /** Maximal value-per-cost prefix with Σcost ≤ `budget`.
    * Output: (id, cost, value, ratio double r6, cum_cost long),
    * ratio-desc, ties broken on id ascending.
    */
  def greedyPrefix(df: DataFrame, idCol: String, costCol: String,
      valueCol: String, budget: Long): DataFrame = {
    val base = df.select(col(idCol), col(costCol).cast("long").as("cost"),
        col(valueCol).cast("long").as("value"))
      .filter(col("cost") > 0)
      .withColumn("ratio", col("value").cast("double") / col("cost").cast("double"))
    // Bucket boundaries from a quantile sketch; any boundary set is
    // CORRECT (it only tunes balance) because equal ratios share a
    // bucket and cum_cost composes from exact per-bucket sums.
    val nBuckets = 64
    val bounds = base.stat
      .approxQuantile("ratio", (1 until nBuckets).map(_.toDouble / nBuckets).toArray, 0.01)
      .distinct.sorted
    val bucket = if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.map(lit(_)): _*), b => b >= col("ratio")))
    val bucketed = base.withColumn("_bk", bucket)
    val totals = bucketed.groupBy(col("_bk")).agg(sum(col("cost")).as("_bt"))
    // exclusive prefix offsets over ≤ nBuckets rows — metadata-scale window
    val wOff = Window.orderBy(col("_bk")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_off", coalesce(sum(col("_bt")).over(wOff), lit(0L)))
      .select(col("_bk"), col("_off"))
    val wIn = Window.partitionBy(col("_bk"))
      .orderBy(col("ratio").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    bucketed.join(broadcast(offsets), "_bk")
      .filter(col("_off") <= budget) // prune whole buckets past the boundary
      .withColumn("cum_cost", col("_off") + sum(col("cost")).over(wIn))
      .filter(col("cum_cost") <= budget)
      .select(col(idCol), col("cost"), col("value"),
        round(col("ratio"), 6).as("ratio"), col("cum_cost"))
  }
}
