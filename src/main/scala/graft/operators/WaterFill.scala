package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Max-min fair (water-filling) budget allocation across sources:
  * given per-source integer demands and a total budget, fully serve
  * every source whose demand fits under the rising water level and
  * split what remains evenly across the rest — the fair-share
  * complement to [[MixturePlanner]] (which matches a target mix) and
  * [[BudgetSelection]] (which greedily maximizes value): here no
  * source can starve another below its fair share.
  *
  * All-integer arithmetic: the classic criterion
  * d_k·(n−k+1) ≤ B − P_{k−1} (sorted ascending, P = prefix sum)
  * decides full service exactly; the leftover splits div/mod with the
  * deterministic remainder going to the smallest unserved sources
  * first. Replays bit-for-bit in any engine.
  *
  * Scale shape: runs on the per-source aggregate (sources, not rows);
  * the sort window over that tiny frame is the only ordering. The
  * demand rollup upstream is the usual map-side-combined groupBy.
  */
object WaterFill {

  /** (src, demand, alloc, served) per source: `served` sources get
    * alloc = demand; the rest get the floor water level, +1 for the
    * first `remainder` of them in (demand, src) order, clamped to
    * demand. Demands must be positive integers.
    */
  def allocate(demands: DataFrame, srcCol: String, demandCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0)
    val base = demands.select(col(srcCol).as("src"),
      col(demandCol).cast("long").as("demand"))
    val ord = Window.orderBy(col("demand"), col("src"))
    val wAll = Window.partitionBy()
    val ranked = base
      .withColumn("k", row_number().over(ord))
      .withColumn("pk", sum(col("demand")).over(
        ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(wAll))
      // served iff serving me and everyone after me at my demand fits:
      // demand·(n−k+1) ≤ budget − P_{k−1}
      .withColumn("served",
        col("demand") * (col("n") - col("k") + 1) <=
          lit(budget) - (col("pk") - col("demand")))
    val stats = ranked.agg(
      sum(when(col("served"), col("demand")).otherwise(0L)).as("p_served"),
      sum(col("served").cast("long")).as("n_served"),
      max(col("n")).as("n_all"))
    val withLevel = ranked.crossJoin(broadcast(stats))
      .withColumn("n_unserved", col("n_all") - col("n_served"))
      .withColumn("level",
        when(col("n_unserved") === 0, lit(0L))
          .otherwise(expr("(" + budget + "L - p_served) div n_unserved")))
      .withColumn("rem",
        when(col("n_unserved") === 0, lit(0L))
          .otherwise(expr("(" + budget + "L - p_served) % n_unserved")))
      // unserved sources rank 1.. in the same (demand, src) order
      .withColumn("uk", col("k") - col("n_served"))
    withLevel.select(col("src"), col("demand"),
      when(col("served"), col("demand"))
        .otherwise(least(col("demand"),
          col("level") + when(col("uk") <= col("rem"), 1L).otherwise(0L)))
        .as("alloc"),
      col("served"))
  }
}
