package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Theil–Sen robust regression: slope = the MEDIAN of all pairwise
  * slopes, intercept = the median residual at that slope — the
  * outlier-immune trend fit (29% breakdown point) that OLS cannot give
  * you: one corrupted telemetry spike moves a least-squares line, but
  * not the median of slopes. The robust-stats sibling of
  * [[RobustOutliers]] (MAD flags points; this fits THROUGH them).
  *
  * The estimator is inherently pairwise, so the SCALE KNOB is the
  * caller's deterministic row sample (hash-pick ~10³ rows → ~10⁶
  * pairs): the pair join runs over the BOUNDED sample only — s² pairs
  * by construction, the corpus never self-joins. Both medians are
  * exact lower-median order statistics found with [[Conformal]]'s
  * distributed quantile-bracket search — no TakeOrdered whose k
  * scales with the pair count ever runs, so the fit stays safe even
  * when the pair frame itself is huge — and the whole fit
  * hash-replays: pair set, slopes, medians, intercept.
  */
object TheilSen {

  /** Single-row fit over a PRE-SAMPLED frame: (n_sample, n_pairs,
    * slope r6, intercept r6). Pairs are ordered by `idCol` (each
    * unordered pair once); vertical pairs (equal x) contribute no
    * slope. Requires at least one slope-defining pair.
    */
  def fit(sample: DataFrame, idCol: String, xCol: String, yCol: String): DataFrame = {
    val spark = sample.sparkSession
    import spark.implicits._
    // Unconditional fan-out (round 20): the s² pair join below streams
    // `base` and inherits its partitioning — AQE coalesces the tiny
    // sample to ONE partition, serializing the s²-pair slope loop and
    // every later pass over `slopes`. The sample is bounded (~10³ rows)
    // by this operator's contract, so an explicit repartition costs
    // nothing at any scale and pins the parallelism AQE would remove.
    val fan = sample.sparkSession.sessionState.conf.numShufflePartitions
    val base = sample.select(col(idCol).as("_id"),
      col(xCol).cast("double").as("_x"), col(yCol).cast("double").as("_y"))
      .repartition(fan, col("_id"))
      .persist()
    val nSample = base.count()
    val a = base.select(col("_id").as("_ia"), col("_x").as("_xa"), col("_y").as("_ya"))
    val b = base.select(col("_id").as("_ib"), col("_x").as("_xb"), col("_y").as("_yb"))
    val slopes = a.join(b, col("_ia") < col("_ib") && col("_xa") =!= col("_xb"))
      .select(((col("_yb") - col("_ya")) / (col("_xb") - col("_xa"))).as("_s"))
      .persist()
    val nPairs = slopes.count()
    require(nPairs > 0, "TheilSen.fit: no slope-defining pairs (all x equal?)")
    def lowerMedian(df: DataFrame, c: String, n: Long): Double = {
      val k = (n + 1) / 2
      Conformal.orderStatistics(df, c, n, Seq(k))(k)
    }
    val slope = lowerMedian(slopes, "_s", nPairs)
    slopes.unpersist()
    val resid = base.select((col("_y") - lit(slope) * col("_x")).as("_r"))
    val intercept = lowerMedian(resid, "_r", nSample)
    base.unpersist()
    val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
    Seq((nSample, nPairs, r6(slope), r6(intercept)))
      .toDF("n_sample", "n_pairs", "slope", "intercept")
  }
}
