package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocking-quality audit for entity resolution / dedup: before
  * running an expensive pairwise matcher, measure what a candidate
  * blocking key actually buys — its '''reduction ratio''' (fraction of
  * the all-pairs comparison space the blocks eliminate) against its
  * '''pair completeness''' (fraction of ground-truth match pairs that
  * still share a block, i.e. are findable at all). The standard
  * pre-flight for [[EntityResolution]]: a key with RR 0.999 but PC 0.6
  * silently loses 40% of the matches; this makes that trade explicit.
  *
  * Pair counts are NEVER materialized as pairs: every count is
  * Σ c·(c−1)/2 over a group-size histogram — three map-side-combined
  * aggregates (by block, by truth key, by both), exact longs
  * throughout (valid to ~4·10⁹ rows before n² exceeds a long; past
  * that, audit a uniform key-sample — the ratios are scale-free).
  */
object BlockingAudit {

  /** Single-row report: (n_rows, n_pairs, n_cand_pairs, n_true_pairs,
    * n_covered, reduction_ratio r6, completeness r6) for blocking
    * expression `blockKey` against ground-truth grouping `truthKey`.
    * A truth pair counts as covered when both members share a block
    * (records carry ONE block key each here — multi-key blocking
    * unions several audits).
    */
  def audit(df: DataFrame, blockKey: Column, truthKey: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(blockKey.as("_b"), truthKey.as("_t"))
    def pairSum(grouped: DataFrame): Long =
      grouped.agg(sum(expr("_c * (_c - 1) div 2")).as("_p"))
        .head().getAs[Any]("_p") match {
          case null => 0L
          case l: Long => l
          case other => other.toString.toLong
        }
    val n = keyed.count()
    val cand = pairSum(keyed.groupBy(col("_b")).agg(count(lit(1)).as("_c")))
    val truth = pairSum(keyed.groupBy(col("_t")).agg(count(lit(1)).as("_c")))
    val covered = pairSum(keyed.groupBy(col("_t"), col("_b")).agg(count(lit(1)).as("_c")))
    val total = n * (n - 1) / 2
    val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
    val rr = if (total == 0) 1.0 else 1.0 - cand.toDouble / total
    val pc = if (truth == 0) 1.0 else covered.toDouble / truth
    Seq((n, total, cand, truth, covered, r6(rr), r6(pc)))
      .toDF("n_rows", "n_pairs", "n_cand_pairs", "n_true_pairs", "n_covered",
        "reduction_ratio", "completeness")
  }
}
