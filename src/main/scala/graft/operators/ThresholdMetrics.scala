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
}
