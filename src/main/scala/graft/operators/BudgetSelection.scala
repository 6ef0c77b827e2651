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
  * Scale shape (100 TB): scoring is embarrassingly parallel; the
  * ordered prefix needs a global sort ONLY over (ratio, id, cost) —
  * three narrow columns, never the payload — and the running total is
  * a cumulative window over that sort. At extreme scale swap the exact
  * sort for range-partitioned bucketing on the ratio (sample
  * quantiles, then only the boundary bucket needs the exact scan);
  * the exact form here is the audit path.
  */
object BudgetSelection {

  /** Maximal value-per-cost prefix with Σcost ≤ `budget`.
    * Output: (id, cost, value, ratio double r6, cum_cost long),
    * ratio-desc, ties broken on id ascending.
    */
  def greedyPrefix(df: DataFrame, idCol: String, costCol: String,
      valueCol: String, budget: Long): DataFrame = {
    val w = Window.orderBy(col("ratio").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.select(col(idCol), col(costCol).cast("long").as("cost"),
        col(valueCol).cast("long").as("value"))
      .filter(col("cost") > 0)
      .withColumn("ratio", col("value").cast("double") / col("cost").cast("double"))
      .withColumn("cum_cost", sum(col("cost")).over(w))
      .filter(col("cum_cost") <= budget)
      .select(col(idCol), col("cost"), col("value"),
        round(col("ratio"), 6).as("ratio"), col("cum_cost"))
  }
}
