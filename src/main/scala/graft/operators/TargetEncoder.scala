package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Out-of-fold (leave-fold-out) target encoding: replace a categorical
  * feature with the label mean computed from the OTHER folds, smoothed
  * toward the global prior — the standard leakage-safe way to feed
  * high-cardinality categoricals to a tree/linear model (a row never
  * sees its own label through its encoding).
  *
  * 100 TB design: ONE shuffle — the (category, fold) groupBy with
  * map-side combine collapses the fact table to |cats|·|folds| rows of
  * integer sums; per-category totals come from a window over that tiny
  * table (same partitioning, no second scan), and the global prior is a
  * 1-row aggregate broadcast in. All sums are integer counts, so the
  * encoding is a deterministic ratio of longs — no float accumulation
  * order anywhere. To apply, broadcast-join the emitted table back on
  * (category, fold).
  */
object TargetEncoder {

  /** Encoding table (cat, fold, n_oof, pos_oof, enc): for every observed
    * (category, fold), the smoothed out-of-fold label mean
    * `(pos_total - pos_fold + smoothing·prior) / (n_total - n_fold + smoothing)`.
    *
    * @param labelCol 0/1 integer label column
    * @param smoothing pseudo-count pulling rare categories to the prior
    */
  def oofEncodingTable(df: DataFrame, catCol: String, foldCol: String,
      labelCol: String, smoothing: Double = 20.0): DataFrame = {
    val byFold = df.groupBy(col(catCol).as("cat"), col(foldCol).as("fold"))
      .agg(count(lit(1)).as("n_f"), sum(col(labelCol).cast("long")).as("pos_f"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cat"))
    val prior = df.agg(
      (sum(col(labelCol).cast("long")).cast("double") / count(lit(1))).as("prior"))
    byFold
      .withColumn("n_t", sum(col("n_f")).over(w))
      .withColumn("pos_t", sum(col("pos_f")).over(w))
      .crossJoin(broadcast(prior))
      .select(col("cat"), col("fold"),
        (col("n_t") - col("n_f")).as("n_oof"),
        (col("pos_t") - col("pos_f")).as("pos_oof"),
        (((col("pos_t") - col("pos_f")).cast("double") + lit(smoothing) * col("prior")) /
          ((col("n_t") - col("n_f")).cast("double") + lit(smoothing))).as("enc"))
  }
}
