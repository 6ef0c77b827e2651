package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: NDCG@k and MRR over a ranked
  * candidate list with binary relevance — the metrics that grade an
  * ANN index / hybrid retriever against labeled data, closing the loop
  * the recall monitors (q_ann_*_recall) open.
  *
  * Determinism contract: rank discounts 1/log2(i+1) and reciprocal
  * ranks 1/i are irrational/repeating, so both are FIXED INTEGER-MICRO
  * LITERAL TABLES (same table in the oracle SQL); per-query DCG/IDCG
  * are exact integer sums, the NDCG ratio is one double division
  * rounded to ppm, and the corpus means sum integers — no float
  * accumulation order anywhere. Works for any k ≤ 10 (extend the
  * tables for deeper cuts).
  *
  * Scale shape: one map-side-combined groupBy per query id over ≤ k
  * rows each, then one global single-row aggregate. The expensive part
  * is upstream (the top-k retrieval itself); the metric adds no
  * shuffle beyond the per-query rollup.
  */
object RankingMetrics {

  /** round(1e6 / log2(i+1)) for i = 1..10. */
  val DcgWeightUs: Seq[(Int, Long)] = Seq(
    1 -> 1000000L, 2 -> 630930L, 3 -> 500000L, 4 -> 430677L, 5 -> 386853L,
    6 -> 356207L, 7 -> 333333L, 8 -> 315465L, 9 -> 301030L, 10 -> 289065L)

  /** round(1e6 / i) for i = 1..10. */
  val MrrWeightUs: Seq[(Int, Long)] = Seq(
    1 -> 1000000L, 2 -> 500000L, 3 -> 333333L, 4 -> 250000L, 5 -> 200000L,
    6 -> 166667L, 7 -> 142857L, 8 -> 125000L, 9 -> 111111L, 10 -> 100000L)

  /** Ideal DCG for r relevant results: prefix sums of [[DcgWeightUs]]. */
  val IdcgUs: Seq[(Int, Long)] =
    DcgWeightUs.scanLeft(0 -> 0L) { case ((_, acc), (i, w)) => i -> (acc + w) }.tail

  private def lookup(table: Seq[(Int, Long)], key: Column): Column =
    element_at(
      map(table.flatMap { case (i, w) => Seq(lit(i), lit(w)) }: _*), key)

  /** One-row (n_queries, mean_ndcg, mean_mrr, n_zero) from ranked
    * candidates: `ranked` must carry (`queryId`, `rankCol` 1-based ≤ 10,
    * `relCol` 0/1). Queries with no relevant candidate score 0 on both
    * metrics and are counted in n_zero.
    */
  def ndcgMrr(ranked: DataFrame, queryId: String, rankCol: String,
      relCol: String): DataFrame = {
    val perQuery = ranked
      .groupBy(col(queryId))
      .agg(
        sum(when(col(relCol) === 1, lookup(DcgWeightUs, col(rankCol)))
          .otherwise(0L)).as("dcg_us"),
        sum(col(relCol).cast("long")).as("n_rel"),
        min(when(col(relCol) === 1, col(rankCol))).as("first_rel"))
      .select(
        when(col("n_rel") === 0, 0L)
          .otherwise(round(col("dcg_us") * lit(1000000L) /
            lookup(IdcgUs, col("n_rel").cast("int"))).cast("long")).as("ndcg_ppm"),
        when(col("first_rel").isNull, 0L)
          .otherwise(lookup(MrrWeightUs, col("first_rel"))).as("mrr_us"),
        (col("n_rel") === 0).cast("long").as("zero"))
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      round(sum(col("ndcg_ppm")).cast("double") / count(lit(1)) / 1000000.0, 6)
        .as("mean_ndcg"),
      round(sum(col("mrr_us")).cast("double") / count(lit(1)) / 1000000.0, 6)
        .as("mean_mrr"),
      sum(col("zero")).as("n_zero"))
  }
}
