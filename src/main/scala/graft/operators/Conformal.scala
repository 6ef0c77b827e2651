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
  * 100 TB design: the k-th order statistic is found DISTRIBUTIVELY —
  * one `approx_quantile` pass brackets each target rank to a value
  * range guaranteed (by the sketch's rank-error bound) to contain the
  * exact k-th value, one exact count aggregate locates the rank inside
  * each bracket, and only the bracket slice (≈ rank-error·n rows, NOT
  * α·n) is touched by the final TakeOrdered. Nothing proportional to
  * the calibration-set size ever reaches the driver. Coverage is one
  * conditional aggregate over the eval slice for all alphas together.
  *
  * Degenerate regimes follow the standard definition: α < 1/(n_cal+1)
  * means ⌈(n+1)(1−α)⌉ > n_cal and qhat = +∞ (the guarantee is
  * unachievable at finite n — every eval point is covered); an empty
  * eval slice reports null coverage rather than NaN.
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
    // k > nCal (alpha below 1/(n+1)): qhat = +inf by definition
    val finiteKs = ks.values.filter(_ <= nCal).toSeq.distinct.sorted
    val kth = orderStatistics(cal, "s", nCal, finiteKs)
    val qhat = alphas.map { a =>
      a -> (if (ks(a) <= nCal) kth(ks(a)) else Double.PositiveInfinity)
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
      val coverage = if (nEval == 0) None
        else Some(math.rint(covRow.getLong(i + 1).toDouble / nEval * 1e6) / 1e6)
      (a, nCal, ks(a), math.rint(qhat(a) * 1e6) / 1e6, nEval, coverage)
    }.toDF("alpha", "n_cal", "k", "qhat", "n_eval", "coverage")
      .orderBy(col("alpha"))
  }

  /** EXACT k-th smallest values of `c` (1-based ranks over `n` rows),
    * found without moving O(n) rows anywhere: approx-quantile bracket
    * (rank error ε·n each side) → exact rank-of-bracket-floor count →
    * TakeOrdered over only the bracket slice. One sketch pass + one
    * count aggregate + one bracket fetch per distinct rank.
    */
  private[operators] def orderStatistics(vals: DataFrame, c: String, n: Long,
      ranks: Seq[Long]): Map[Long, Double] = {
    if (ranks.isEmpty) return Map.empty
    val eps = 1e-4
    val probs = ranks.flatMap { k =>
      val p = k.toDouble / n
      Seq(math.max(0.0, p - 3 * eps), math.min(1.0, p + 3 * eps))
    }
    val qs = vals.stat.approxQuantile(c, probs.toArray, eps)
    val brackets = ranks.zipWithIndex.map { case (k, i) =>
      k -> (qs(2 * i), qs(2 * i + 1))
    }
    // one exact aggregate: rows strictly below each bracket floor
    val belowAggs = brackets.zipWithIndex.map { case ((_, (lo, _)), i) =>
      sum(when(col(c) < lo, 1L).otherwise(0L)).as(s"b$i")
    }
    val belowRow = vals.agg(belowAggs.head, belowAggs.tail: _*).head()
    brackets.zipWithIndex.map { case ((k, (lo, hi)), i) =>
      if (lo == hi) k -> lo // the whole ±3ε rank window is one tied value
      else {
        val nBelow = belowRow.getLong(i)
        val r = (k - nBelow).toInt // rank of the target inside the bracket
        require(r >= 1, s"order statistic bracket miss for rank $k (below=$nBelow)")
        // guard BOTH bracket sides: count inside the limit(r) slice — if
        // the upper bound fell below the true k-th value the slice holds
        // fewer than r rows, and agg(max) would silently return the
        // bracket maximum instead of the k-th order statistic
        val row = vals.filter(col(c) >= lo && col(c) <= hi)
          .orderBy(col(c).asc).limit(r)
          .agg(max(col(c)), count(lit(1))).head()
        require(row.getLong(1) == r,
          s"order statistic bracket miss for rank $k: bracket [$lo,$hi] holds " +
            s"${row.getLong(1)} rows above $nBelow, need $r")
        k -> row.getDouble(0)
      }
    }.toMap
  }
}
