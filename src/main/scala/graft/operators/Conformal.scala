package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split conformal prediction: turn ANY point predictor into one with
  * finite-sample coverage guarantees — qhat = the ⌈(n+1)(1−α)⌉-th
  * smallest calibration residual; the interval ŷ ± qhat then covers
  * ≥ 1−α of exchangeable future points, no distributional assumptions.
  * The report computes qhat per requested α and the realized coverage
  * on the held-out slice — the modern ML-eval artifact next to
  * [[Calibration]]'s reliability diagram.
  *
  * 100 TB design: the k-th smallest residual is fetched as the MIN of
  * the top-(n+1−k) LARGEST residuals — one TakeOrdered of ~α·n rows
  * (small for the small α one actually calibrates at), never a global
  * sort or single-partition rank window; all alphas share ONE
  * TakeOrdered sized by the largest α. Coverage is one conditional
  * aggregate over the eval slice for all alphas together.
  */
object Conformal {

  /** (alpha, n_cal, k, qhat, n_eval, coverage) per alpha; residual =
    * |yCol − yhatCol|. Requires 0 < alpha < 1 and a nonempty
    * calibration slice.
    */
  def report(scored: DataFrame, yCol: String, yhatCol: String,
      isCal: Column, alphas: Seq[Double]): DataFrame = {
    require(alphas.nonEmpty && alphas.forall(a => a > 0 && a < 1),
      s"alphas must lie in (0,1): $alphas")
    val spark = scored.sparkSession
    val s = abs(col(yCol) - col(yhatCol))
    val cal = scored.filter(isCal).select(s.as("s"))
    val nCal = cal.count()
    require(nCal > 0, "empty calibration slice")
    val ks = alphas.map(a => a -> math.ceil((nCal + 1) * (1 - a)).toLong).toMap
    val mMax = alphas.map(a => (nCal + 1 - ks(a)).toInt).max
    // descending top-mMax: TakeOrderedAndProject, α·(n+1) rows to the driver
    val top = cal.orderBy(col("s").desc).limit(mMax).collect().map(_.getDouble(0))
    val qhat = alphas.map { a =>
      val m = (nCal + 1 - ks(a)).toInt // min of top-m largest = k-th smallest
      a -> top(m - 1)
    }.toMap
    val eval = scored.filter(!isCal).select(s.as("s"))
    val covAggs = count(lit(1)).as("n_eval") +:
      alphas.zipWithIndex.map { case (a, i) =>
        sum(when(col("s") <= qhat(a), 1L).otherwise(0L)).as(s"c$i")
      }
    val covRow = eval.agg(covAggs.head, covAggs.tail: _*).head()
    val nEval = covRow.getLong(0)
    import spark.implicits._
    alphas.zipWithIndex.map { case (a, i) =>
      (a, nCal, ks(a), math.rint(qhat(a) * 1e6) / 1e6, nEval,
        math.rint(covRow.getLong(i + 1).toDouble / nEval * 1e6) / 1e6)
    }.toDF("alpha", "n_cal", "k", "qhat", "n_eval", "coverage")
      .orderBy(col("alpha"))
  }
}
