package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Threshold-sweep confusion-matrix metrics — the reference's richest
  * relational query (`src/random_forest.py:136-221`, M10 in SURVEY §2).
  *
  * Input: (probability, label) scored rows. Output: one row per
  * probability bucket with TP/FP/TN/FN and derived metrics as if the
  * decision threshold were that bucket's lower edge.
  *
  * Single pass over the data: bucket → groupBy count → domain-completing
  * outer join → two cumulative windows → conditional-sum pivot. The
  * cumulative windows run over `nBuckets` rows per label — microscopic
  * state regardless of input scale, so the only full-data shuffle is the
  * initial bucket count (map-side combined).
  */
object ThresholdMetrics {

  def compute(scored: DataFrame, nBuckets: Int = 20,
      probCol: String = "probability", labelCol: String = "label"): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._

    // bucket id clamped to [0, nBuckets-1]: prob==1.0 lands in the top
    // bucket, and out-of-range probabilities (<0 or >1) clamp to the edge
    // buckets instead of silently vanishing in the domain left-join
    val bucketed = scored
      .withColumn("bucket",
        greatest(least(floor(col(probCol) * nBuckets).cast("int"), lit(nBuckets - 1)), lit(0)))
      .groupBy(col(labelCol).cast("int").as("label"), $"bucket")
      .agg(count(lit(1)).as("n"))

    // complete the (label × bucket) domain so empty buckets appear
    val domain = spark.range(0, nBuckets.toLong).select($"id".cast("int").as("bucket"))
      .crossJoin(Seq(0, 1).toDF("label"))
    val full = domain.join(bucketed, Seq("label", "bucket"), "left_outer")
      .na.fill(0L, Seq("n"))

    // rows with bucket >= t are predicted positive at threshold t
    val byLabel = Window.partitionBy($"label").orderBy($"bucket")
    val cum = full
      .withColumn("n_below", sum($"n").over(
        byLabel.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("n_at_or_above", sum($"n").over(
        byLabel.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .na.fill(0L, Seq("n_below"))

    // pivot the two label rows into tp/fp/tn/fn columns per bucket
    val curve = cum.groupBy($"bucket").agg(
      sum(when($"label" === 1, $"n_at_or_above")).as("tp"),
      sum(when($"label" === 0, $"n_at_or_above")).as("fp"),
      sum(when($"label" === 0, $"n_below")).as("tn"),
      sum(when($"label" === 1, $"n_below")).as("fn"))

    curve
      .withColumn("threshold", $"bucket".cast("double") / nBuckets)
      .withColumn("precision",
        when($"tp" + $"fp" === 0, lit(0.0)).otherwise($"tp" / ($"tp" + $"fp")))
      .withColumn("recall",
        when($"tp" + $"fn" === 0, lit(0.0)).otherwise($"tp" / ($"tp" + $"fn")))
      .withColumn("fpr",
        when($"fp" + $"tn" === 0, lit(0.0)).otherwise($"fp" / ($"fp" + $"tn")))
      .withColumn("accuracy", ($"tp" + $"tn") / ($"tp" + $"fp" + $"tn" + $"fn"))
      .withColumn("f1",
        when($"precision" + $"recall" === 0, lit(0.0))
          .otherwise(lit(2) * $"precision" * $"recall" / ($"precision" + $"recall")))
      .orderBy($"bucket")
  }

  /** The reference's EXACT artifact shape — `results/brf/metrics.csv`
    * as written by `export_results.py:45-46` from
    * `random_forest.py:136-220`: thresholds at the bucket UPPER edge
    * `(b+1)/n`, the reference's column headers verbatim (spaces and
    * capitals included), and its edge conventions — `floor` WITHOUT a
    * clamp (prob == 1.0 overflows into bucket n and survives the full
    * outer domain join), an unguarded precision (an empty artifact
    * cell — here NULL via try_divide — when no row scores at-or-above
    * the threshold), a zero-guarded recall, and the
    * four count-over-total percentage columns. `ResultsParitySpec`
    * pins this frame column-for-column against the committed CSV.
    * Engine users should prefer [[compute]], whose clamped buckets and
    * guarded ratios are the saner defaults; this method exists so a
    * reference user's downstream readers of metrics.csv keep working.
    */
  def referenceCurve(scored: DataFrame, nPoints: Int = 20,
      probCol: String = "probability", labelCol: String = "label"): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val total = scored.count().toDouble
    val bucketed = scored
      .select(col(labelCol).cast("int").as("label"),
        floor(col(probCol) * nPoints).cast("long").as("id_bucket"))
      .groupBy($"label", $"id_bucket").agg(count(lit(1)).as("n"))
    // domain -1..n-1 (threshold 0.0..1.0); FULL outer keeps overflow
    // buckets from out-of-[0,1) probabilities, as the reference does
    val domain = spark.range(-1L, nPoints.toLong).select($"id".as("id_bucket"))
      .crossJoin(Seq(0, 1).toDF("label"))
    val full = domain.join(bucketed, Seq("id_bucket", "label"), "full_outer")
      .na.fill(0L, Seq("n"))
    val byLabel = Window.partitionBy($"label").orderBy($"id_bucket")
    // predicted negative at threshold (b+1)/n: buckets <= b (current
    // row INCLUDED — the reference's inf window); positive: strictly
    // above
    val cum = full
      .withColumn("n_neg", sum($"n").over(
        byLabel.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_pos", coalesce(sum($"n").over(
        byLabel.rowsBetween(1, Window.unboundedFollowing)), lit(0L)))
    val curve = cum.groupBy($"id_bucket").agg(
      sum(when($"label" === 0, $"n_neg")).as("tn"),
      sum(when($"label" === 0, $"n_pos")).as("fp"),
      sum(when($"label" === 1, $"n_neg")).as("fn"),
      sum(when($"label" === 1, $"n_pos")).as("tp"))
      .na.fill(0L, Seq("tn", "fp", "fn", "tp"))
    def d(c: String) = col(c).cast("double")
    // the reference's unguarded 0/0 cells reached its artifact as EMPTY
    // (pandas NaN → empty csv cell); under ANSI, try_divide's NULL is
    // the same empty cell — and what DuckDB's division yields, so the
    // oracle compare is exact
    curve
      .withColumn("Threshold", ($"id_bucket" + 1).cast("double") / nPoints)
      .withColumn("Precision", try_divide(d("tp"), d("tp") + d("fp")))
      .withColumn("Recall",
        when($"tp" =!= 0, d("tp") / (d("tp") + d("fn"))).otherwise(0.0))
      .withColumn("False positive rate", try_divide(d("fp"), d("fp") + d("tn")))
      .withColumn("Accuracy",
        (d("tp") + d("tn")) / (d("tp") + d("tn") + d("fp") + d("fn")))
      .withColumn("F1 Score",
        try_divide(lit(2) * $"Precision" * $"Recall", $"Precision" + $"Recall"))
      .withColumn("True negative percentage", d("tn") / total)
      .withColumn("True positive percentage", d("tp") / total)
      .withColumn("False negative percentage", d("fn") / total)
      .withColumn("False positive percentage", d("fp") / total)
      .drop("id_bucket", "tn", "fp", "fn", "tp")
      .orderBy($"Threshold")
  }
}
