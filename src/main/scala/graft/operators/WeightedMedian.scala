package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group weighted median: the smallest value whose cumulative
  * weight reaches half the group's total — the robust center for
  * quantity-weighted prices, token-weighted scores, size-weighted
  * latencies; lower weighted-median semantics (no interpolation), so
  * the result is always an observed value and all comparisons stay in
  * exact integer arithmetic (cum·2 ≥ total — no float halving).
  *
  * Scale shape: rows first collapse to (group, value) weight sums — a
  * map-side-combined aggregate that bounds the window frame by value
  * cardinality, not row count. The cumulative-weight window partitions
  * by group (one hash shuffle); the crossing filter + min is another
  * map-side agg. Nothing global, nothing quadratic.
  */
object WeightedMedian {

  /** (grp, wmedian, total_weight) per group. `valueCol` and `weightCol`
    * must be exact integers (cents, not doubles); weights must be
    * positive.
    */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    val vw = df
      .select(col(groupCol).as("grp"), col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w"))
      .groupBy(col("grp"), col("v")).agg(sum(col("w")).as("w"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy(col("grp"))
    vw.withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("tot", sum(col("w")).over(wTot))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("grp"))
      .agg(min(col("v")).as("wmedian"), min(col("tot")).as("total_weight"))
  }
}
