package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact two-sample Kolmogorov–Smirnov distance: the largest gap
  * between two empirical CDFs — the binning-free distribution-shift
  * test next to the binned KL drift (X47) and the χ² SRM gate (X100):
  * KL needs a bin choice and χ² needs categories; KS compares the raw
  * distributions at every observed value.
  *
  * Determinism contract: the statistic is computed SCALED —
  * D·n₁·n₂ = max |F₁(x)·n₂ − F₂(x)·n₁| over observed x — so the
  * entire search is exact integer arithmetic; one double division at
  * the end. The argmax value reports where the distributions diverge
  * most (ties → smallest x).
  *
  * Scale shape: per-value counts collapse first (map-side combine;
  * frame = value cardinality), then one ordered cumulative window.
  * The window is single-partition (a CDF needs the total order) —
  * beyond memory, the same code runs on the bucketed two-pass prefix
  * sum (the [[Skyline]] pattern) or a value grid.
  */
object KsTest {

  /** One row (n1, n2, d_scaled, at_v, d): the exact KS distance
    * between the `valueCol` distributions of `groupA` and `groupB`
    * rows (other groups ignored). `valueCol` must be integral.
    */
  def twoSample(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val x = df.filter(col(groupCol).isin(groupA, groupB))
      .select(col(valueCol).cast("long").as("v"),
        when(col(groupCol) === groupA, 1L).otherwise(0L).as("a"),
        when(col(groupCol) === groupB, 1L).otherwise(0L).as("b"))
    val perValue = x.groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
    val wCdf = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    val cdf = perValue
      .withColumn("f1", sum(col("ca")).over(wCdf))
      .withColumn("f2", sum(col("cb")).over(wCdf))
    val totals = x.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"))
    cdf.crossJoin(broadcast(totals))
      .select(col("n1"), col("n2"), col("v"),
        abs(col("f1") * col("n2") - col("f2") * col("n1")).as("dabs"))
      .orderBy(col("dabs").desc, col("v"))
      .limit(1)
      .select(col("n1"), col("n2"), col("dabs").as("d_scaled"), col("v").as("at_v"),
        round(col("dabs").cast("double") / (col("n1") * col("n2").cast("double")), 6)
          .as("d"))
  }
}
