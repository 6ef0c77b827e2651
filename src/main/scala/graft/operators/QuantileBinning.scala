package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile discretization (feature binning) on EXACT percentiles — the
  * deterministic sibling of MLlib's QuantileDiscretizer (whose
  * approxQuantile boundaries depend on the sketch and can't be replayed
  * externally). One aggregation computes all interior boundaries; bin
  * assignment is a codegen'd sum of strict comparisons. A value can only
  * equal a boundary when the percentile lands exactly on a data point
  * (interpolation fraction 0), where every engine computes the identical
  * bit pattern — so assignments agree across engines even when
  * interpolated boundaries differ in the last ulp (no data value can sit
  * between two ulp-variants of the same boundary).
  *
  * Scale: the exact percentile is one shuffle of the value column; at
  * 100 TB swap `bins` for approx_percentile with an assertion gate
  * (see q_agg_sketches) and keep `assignBin` unchanged.
  */
object QuantileBinning {

  /** Interior boundaries (numBins - 1 values) of equal-frequency bins. */
  def bins(df: DataFrame, valueCol: String, numBins: Int): Seq[Double] = {
    require(numBins >= 2, "numBins must be at least 2")
    val ps = (1 until numBins).map(_.toDouble / numBins)
    df.agg(expr(s"percentile($valueCol, array(${ps.mkString(",")}))"))
      .head.getSeq[Double](0)
  }

  /** Bin index in [0, boundaries.size]: the count of boundaries strictly
    * below the value (values equal to a boundary fall in the lower bin).
    */
  def assignBin(valueCol: Column, boundaries: Seq[Double]): Column =
    boundaries.map(b => when(valueCol > b, 1).otherwise(0)).reduce(_ + _)
}
