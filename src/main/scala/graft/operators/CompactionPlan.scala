package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning: assign files (or documents, or any
  * sized unit) to target-sized output bins with a deterministic
  * NEXT-FIT-BY-KEY sweep — bin(i) = floor(prefix_sum_before(i) /
  * target) over units ordered by id. The small-files problem is THE
  * operational tax of a 100 TB lake (every file is a task, a footer
  * read, a name-node entry); a compaction pass needs a plan first, and
  * the plan itself must be computable without collecting the listing to
  * the driver.
  *
  * Next-fit (not first-fit-decreasing) is chosen deliberately: FFD's
  * bin state is sequentially data-dependent and cannot be expressed as
  * a window function, while next-fit is one prefix sum — fully
  * distributed, replayable by any SQL engine, and within 2× of optimal
  * occupancy (each bin except possibly the last is at least half full
  * when unit sizes ≤ target). Units larger than the target get bins to
  * themselves, split across as many as their size requires.
  *
  * Scale shape: one global sort by id for the prefix sum (a listing is
  * millions of rows, not billions — this is metadata-scale), then a
  * map-side bin assignment and one partial-aggregated rollup.
  */
object CompactionPlan {

  /** Per-bin rollup of the next-fit plan.
    *
    * @param units (idCol, sizeCol) — sizeCol in any consistent unit
    * @return (bin long, n_units long, total_size long, min_id, max_id)
    */
  def plan(units: DataFrame, targetSize: Long,
      idCol: String = "file_id", sizeCol: String = "size"): DataFrame = {
    require(targetSize > 0, s"targetSize=$targetSize must be positive")
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    units
      .select(col(idCol), col(sizeCol).cast("long").as("_sz"))
      .withColumn("_cum_before", sum(col("_sz")).over(w) - col("_sz"))
      .withColumn("bin", expr(s"_cum_before div ${targetSize}L"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("_sz")).as("total_size"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))
      .orderBy(col("bin"))
  }
}
