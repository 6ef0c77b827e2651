package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score-quality reports for a probabilistic classifier: the reliability
  * diagram (is a predicted 0.7 really a 70% positive rate?) and the
  * cumulative gains / lift table (how much of the positive mass does the
  * top score band capture?) — the two standard post-training evaluation
  * artifacts next to [[ThresholdMetrics]]' PR curve.
  *
  * 100 TB design: both reports bin on FIXED-WIDTH score bands, so the
  * whole computation is one map-side-combined groupBy to ≤ nBins rows —
  * no global sort, no population ntile (whose single-partition window
  * is exactly what dies at scale; population deciles that must be exact
  * belong on a sampled frame). Cumulatives are a window over the ≤ nBins
  * aggregate rows. Score sums use fixed-point micros (exact integer
  * addition in any order); rates are ratios of longs — nothing in the
  * output depends on partitioning or float accumulation order.
  */
object Calibration {

  private def binCol(scoreCol: String, nBins: Int) =
    least(floor(col(scoreCol) * nBins).cast("long"), lit(nBins - 1L))

  /** Reliability bins (bin, n, pos, avg_score, pos_rate) over a [0,1]
    * score: per fixed-width bin, the mean predicted score vs the
    * realized positive rate, ordered by bin.
    */
  def reliabilityBins(scored: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame =
    scored
      .groupBy(binCol(scoreCol, nBins).as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("pos"),
        sum(round(col(scoreCol) * 1000000).cast("long")).as("score_us"))
      .select(col("bin"), col("n"), col("pos"),
        round(col("score_us").cast("double") / col("n") / 1000000.0, 6).as("avg_score"),
        round(col("pos").cast("double") / col("n"), 6).as("pos_rate"))
      .orderBy(col("bin"))

  /** Cumulative gains by descending score band (bin, n, pos, cum_n,
    * cum_pos, capture, lift): capture = share of all positives above the
    * band's lower edge, lift = positive-rate ratio vs the base rate.
    */
  def gains(scored: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    val binned = scored
      .groupBy(binCol(scoreCol, nBins).as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("pos"))
    val cum = Window.orderBy(col("bin").desc)
    val all = Window.partitionBy()
    binned
      .select(col("bin"), col("n"), col("pos"),
        sum(col("n")).over(cum).as("cum_n"),
        sum(col("pos")).over(cum).as("cum_pos"),
        sum(col("n")).over(all).as("tot_n"),
        sum(col("pos")).over(all).as("tot_pos"))
      .select(col("bin"), col("n"), col("pos"), col("cum_n"), col("cum_pos"),
        round(col("cum_pos").cast("double") / col("tot_pos"), 6).as("capture"),
        round((col("cum_pos").cast("double") / col("cum_n")) /
          (col("tot_pos").cast("double") / col("tot_n")), 6).as("lift"))
      .orderBy(col("bin").desc)
  }
}
