package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * primitive: keep per-key partial aggregates (count / long-sum / min
  * / max, all self-mergeable), and fold each new batch in with ONE
  * full-outer join instead of re-aggregating history. The daily-build
  * complement to [[Scd2]] (which versions rows; this maintains
  * rollups) and [[SnapshotDiff]] (which decides what changed).
  *
  * Measures are exact longs (callers fix floats to cents/micros
  * first, per the fixed-point discipline), so a merged view is
  * BIT-IDENTICAL to a full recompute — the oracle for the query form
  * literally recomputes from scratch and hash-compares.
  *
  * Scale shape (100 TB): each batch aggregates map-side to one row
  * per (key) before the merge join, so the shuffle is bounded by key
  * cardinality, not batch size; history never rescans. Bucket the
  * stored view by key and successive merges are exchange-free.
  */
object IncrementalAgg {

  /** Collapse a batch to per-key partials: (key, cnt, sm, mn, mx). */
  def partial(df: DataFrame, keyCol: String, measureCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(col(measureCol)).as("sm"),
        min(col(measureCol)).as("mn"), max(col(measureCol)).as("mx"))

  /** Delete-aware refresh (the retraction half of view maintenance):
    * subtract a delete batch from the stored partials. count and sum
    * retract arithmetically; min/max are NOT retractable, so only the
    * keys whose deleted extremum TOUCHES the stored extremum recompute
    * — from `remaining` (the post-delete rows), restricted to exactly
    * those keys by a semi join. Keys deleted to zero rows drop out.
    *
    * Scale: the delete batch collapses map-side to per-key partials;
    * the recompute scan touches only danger-key rows (with the view
    * bucketed by key, a partition-pruned read), never full history.
    */
  def retract(base: DataFrame, deletes: DataFrame, remaining: DataFrame,
      keyCol: String, measureCol: String): DataFrame = {
    val d = partial(deletes, keyCol, measureCol)
      .select(col(keyCol), col("cnt").as("dcnt"), col("sm").as("dsm"),
        col("mn").as("dmn"), col("mx").as("dmx"))
    val joined = base.join(d, Seq(keyCol), "left")
      .withColumn("ncnt", col("cnt") - coalesce(col("dcnt"), lit(0L)))
      .withColumn("nsm", col("sm") - coalesce(col("dsm"), lit(0L)))
      .filter(col("ncnt") > 0) // fully-deleted keys leave the view
    val touchesExtremum =
      col("dcnt").isNotNull && (col("dmn") <= col("mn") || col("dmx") >= col("mx"))
    val safe = joined.filter(!touchesExtremum)
      .select(col(keyCol), col("ncnt").as("cnt"), col("nsm").as("sm"),
        col("mn"), col("mx"))
    val danger = joined.filter(touchesExtremum).select(col(keyCol))
    val recomputed = partial(
      remaining.join(danger, Seq(keyCol), "left_semi"), keyCol, measureCol)
    safe.unionByName(recomputed)
  }

  /** Merge two partial-aggregate tables with the same schema. */
  def merge(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val bb = b.select(col(keyCol), col("cnt").as("cnt2"), col("sm").as("sm2"),
      col("mn").as("mn2"), col("mx").as("mx2"))
    a.join(bb, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("cnt2"), lit(0L))).as("cnt"),
        (coalesce(col("sm"), lit(0L)) + coalesce(col("sm2"), lit(0L))).as("sm"),
        least(col("mn"), col("mn2")).as("mn"),   // least/greatest skip nulls
        greatest(col("mx"), col("mx2")).as("mx"))
  }
}
