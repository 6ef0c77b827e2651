package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated on a
  * (minimize x, maximize y) objective pair — price/quality trade-off
  * curves, cost/coverage frontiers, model-selection plots.
  *
  * Scale shape (100 TB): the naive skyline is the quadratic NOT EXISTS
  * self-join the oracle states. Here dominance is resolved in two
  * passes, neither quadratic:
  *
  *  1. '''Bucketed prefix-max prune''' — rows land in fixed-width x
  *     buckets; one map-side-combined groupBy yields max(y) per bucket
  *     (≤ a few thousand rows however large the input), a window over
  *     that tiny frame computes the running max over strictly-lower
  *     buckets, and the result broadcasts back. Any row whose y does
  *     not beat the prefix max is dominated by a strictly-cheaper row
  *     and drops. On real distributions this removes ~everything —
  *     the survivors are the frontier plus same-bucket stragglers.
  *  2. '''Exact pass''' — the surviving candidates (frontier-sized,
  *     not input-sized) run the classical sort-sweep: ordered by
  *     (x asc, y desc), a distinct point is on the frontier iff its y
  *     strictly exceeds the running max of everything before it. The
  *     single-partition window is safe precisely because pass 1 already
  *     shrank the frame; the full input never sees a global sort.
  *
  * Duplicate (x, y) points are all on the frontier together (no strict
  * dominance between equals): the sweep runs on distinct points and the
  * ids rejoin by exact value equality at the end.
  */
object Skyline {

  /** Frontier rows of `df` minimizing `xCol` and maximizing `yCol`.
    * Output: (sk_id, sk_x, sk_y) — every input row whose point is
    * non-dominated.
    *
    * @param bucketWidth fixed x-bucket width for the prune pass; any
    *                    positive value is correct (it only tunes how
    *                    much pass 1 removes), sized so x-range/width
    *                    stays in the low thousands.
    */
  def frontier2d(df: DataFrame, idCol: String, xCol: String, yCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be > 0")
    val pts = df.select(col(idCol).as("sk_id"),
      col(xCol).cast("double").as("sk_x"), col(yCol).cast("double").as("sk_y"))

    val distinctPts = pts.select(col("sk_x"), col("sk_y")).distinct()
      .withColumn("sk_b", floor(col("sk_x") / bucketWidth).cast("long"))

    // Pass 1: per-bucket max(y) (tiny), prefix max over strictly-lower
    // buckets (rows there have strictly smaller x, so y ≤ prefix max
    // proves dominance), broadcast back as the prune bound.
    val bucketMax = distinctPts.groupBy(col("sk_b")).agg(max(col("sk_y")).as("sk_by"))
    val wPrefix = Window.orderBy(col("sk_b")).rowsBetween(Window.unboundedPreceding, -1)
    val prefix = bucketMax.select(col("sk_b"), max(col("sk_by")).over(wPrefix).as("sk_pm"))
    val candidates = distinctPts.join(broadcast(prefix), Seq("sk_b"))
      .filter(col("sk_pm").isNull || col("sk_y") > col("sk_pm"))

    // Pass 2: exact sweep on the pruned, frontier-sized candidate set.
    // Ties in x sort y-desc, so an equal-x-higher-y row lands in the
    // running max before its dominated sibling is tested.
    val wSweep = Window.orderBy(col("sk_x").asc, col("sk_y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = candidates
      .withColumn("sk_prev", max(col("sk_y")).over(wSweep))
      .filter(col("sk_prev").isNull || col("sk_y") > col("sk_prev"))
      .select(col("sk_x"), col("sk_y"))

    pts.join(broadcast(frontier), Seq("sk_x", "sk_y"))
      .select(col("sk_id"), col("sk_x"), col("sk_y"))
  }
}
