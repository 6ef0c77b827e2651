package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-threshold baseline classifier: score(x) =
  * P(label = 1 | count_feature >= count(x)).
  *
  * The reference fits this with one filter+count Spark job per distinct
  * count value — 377 sequential scans (`mains/main_train_base.py:25-51`).
  * Here it is one aggregation + one reverse-cumulative window over the
  * (tiny) distinct-count domain: a single pass at any scale, the exact
  * inefficiency SURVEY §4 flags as "do NOT replicate".
  */
object BaselineRateModel {

  /** @return lookup table (count_value, n, n_pos, cum_n, cum_pos, prob)
    * where prob = P(label=1 | count >= count_value)
    */
  def fit(df: DataFrame, countCol: String, labelCol: String): DataFrame = {
    val byCount = df
      .groupBy(col(countCol).cast("long").as("count_value"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("double") === 1.0, 1L).otherwise(0L)).as("n_pos"))
    val wDesc = Window.orderBy(col("count_value").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byCount
      .withColumn("cum_n", sum(col("n")).over(wDesc))
      .withColumn("cum_pos", sum(col("n_pos")).over(wDesc))
      .withColumn("prob", col("cum_pos").cast("double") / col("cum_n"))
  }

  /** Score rows by joining the lookup on the largest count_value <=
    * count(x), clamping below-domain counts up to the smallest fitted
    * value (P(label=1 | count >= c) is monotone in the fitted domain, so
    * the floor entry is the right generalization for unseen counts —
    * round-1 scored them 0.0, diverging from the reference semantics).
    *
    * The fitted domain is tiny by construction (distinct count values),
    * so it is collected once and the floor lookup is a codegen'd
    * array_max-over-literal-array projection followed by a broadcast
    * equi-join — no range-join shuffle.
    */
  def transform(df: DataFrame, model: DataFrame, countCol: String): DataFrame = {
    val domain = model.select(col("count_value")).collect().map(_.getLong(0)).sorted
    require(domain.nonEmpty, "empty baseline model")
    val domainArr = array(domain.map(lit): _*)
    val cnt = col(countCol).cast("long")
    // null counts stay null (→ unmatched join → prob 0.0): without the
    // guard, filter(v <= null) yields an empty array and the coalesce
    // would silently score unknown-count rows with the floor entry
    val floorKey = when(cnt.isNotNull,
      coalesce(array_max(filter(domainArr, v => v <= cnt)), lit(domain.head)))
    val probs = model.select(col("count_value"), col("prob"))
    df.withColumn("_floor_cv", floorKey)
      .join(broadcast(probs), col("_floor_cv") === col("count_value"), "left_outer")
      .drop("count_value", "_floor_cv")
      .na.fill(Map("prob" -> 0.0))
  }
}
