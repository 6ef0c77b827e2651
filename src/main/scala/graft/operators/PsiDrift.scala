package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Population Stability Index — THE deployed-model drift monitor: bin a
  * score in fixed-width bands, compare the baseline population's band
  * shares p against the current population's q, PSI = Σ (p−q)·ln(p/q).
  * Rule of thumb: <0.1 stable, 0.1–0.25 shifting, >0.25 retrain.
  *
  * 100 TB design: ONE map-side-combined groupBy collapses both
  * populations to ≤ nBins rows each (conditional aggregates over a
  * union-free single scan when both cohorts live in one table); the
  * PSI arithmetic runs on that tiny frame. Shares are ratios of exact
  * longs (Laplace +1 smoothing keeps empty bins finite and
  * deterministic); ln of a ratio of integers is the same
  * engine-replayable shape as the PMI/collocation operators.
  */
object PsiDrift {

  /** Fixed-width bin in [0, nBins): values outside [lo, hi) clamp to the
    * edge bins, so the band definition is total.
    */
  def bin(score: Column, lo: Double, hi: Double, nBins: Int): Column =
    least(greatest(floor((score - lo) / ((hi - lo) / nBins)).cast("long"), lit(0L)),
      lit(nBins - 1L))

  /** Per-bin drift report over one table holding both cohorts:
    * (bin, n_base, n_cur, contrib, psi) — `contrib` the bin's PSI term,
    * `psi` the total replicated on every row (a window over ≤ nBins
    * rows). Smoothed shares: (n+1)/(N+nBins).
    */
  def psiReport(df: DataFrame, scoreCol: String, isBase: Column,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    val binned = df.select(
      bin(col(scoreCol), lo, hi, nBins).as("bin"),
      when(isBase, 1L).otherwise(0L).as("b"))
    val counts = binned.groupBy(col("bin"))
      .agg(sum(col("b")).as("n_base"), sum(lit(1L) - col("b")).as("n_cur"))
    val w = Window.partitionBy(lit(1))
    val p = (col("n_base") + 1).cast("double") / (sum(col("n_base")).over(w) + nBins)
    val q = (col("n_cur") + 1).cast("double") / (sum(col("n_cur")).over(w) + nBins)
    counts
      .withColumn("contrib", (p - q) * log(p / q))
      .withColumn("psi", sum(col("contrib")).over(w))
  }
}
