package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-mixture planning: given the corpus's current per-source
  * counts and a target mixture, compute the per-source keep rates that
  * realize the largest corpus matching the target EXACTLY — the
  * planning step in front of every mixture sampler (you cannot sample
  * your way ABOVE a source's available mass, so the binding source is
  * the one whose availability-to-target ratio is smallest, and every
  * other source downsamples relative to it).
  *
  * All shares are exact integer ratios until the final rounded
  * outputs, so the plan replays on any engine. One count aggregation
  * (map-side combined) + arithmetic on |sources| rows.
  */
object MixturePlanner {

  /** @param target (source, weight double) — need not be normalized;
    *   sources absent from target get weight 0 (dropped).
    * @return (source, n_avail long, target_share r6, keep_rate r6 —
    *   fraction of the source to keep, n_keep long — floor(n·rate))
    *   ordered by source.
    */
  def plan(docs: DataFrame, target: DataFrame,
      sourceCol: String = "source"): DataFrame = {
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_avail"))
    val t = target.select(col(sourceCol), col("weight").cast("double"))
    val wsum = t.agg(sum(col("weight"))).head.getDouble(0)
    val joined = counts.join(broadcast(t), Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_avail"),
        (coalesce(col("weight"), lit(0.0)) / wsum).as("share"))
    // binding source: smallest avail/share — one bounded driver scalar
    val scale = joined.filter(col("share") > 0)
      .select(min(col("n_avail") / col("share"))).head.getDouble(0)
    joined
      .withColumn("keep_rate",
        when(col("share") > 0,
          round(least(lit(1.0), lit(scale) * col("share") / col("n_avail")), 6))
          .otherwise(lit(0.0)))
      .withColumn("n_keep",
        floor(col("n_avail") * col("keep_rate")).cast("long"))
      .select(col(sourceCol), col("n_avail"),
        round(col("share"), 6).as("target_share"),
        col("keep_rate"), col("n_keep"))
      .orderBy(col(sourceCol))
  }
}
