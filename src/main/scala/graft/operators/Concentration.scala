package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration analysis of a non-negative measure over a population:
  * the Lorenz curve (share of total held by each population quantile
  * bucket) and the exact Gini coefficient — revenue concentration,
  * corpus-source dominance, token-budget skew.
  *
  * Scale shape: runs on the PER-ENTITY AGGREGATE (one row per
  * customer/source/key — orders of magnitude below the fact table),
  * produced by a map-side-combined groupBy. The rank window on that
  * frame is single-partition by construction (Gini needs a total
  * order); when even the entity frame is too wide, the same code runs
  * on a bucketed prefix-sum rank (the [[CompactionPlan]] sweep) or a
  * uniform entity sample. Value sums ride exact integer units, so the
  * result is partitioning- and summation-order-independent; `ix`
  * products are summed as DECIMAL(38,0) (rank × value exceeds long
  * range at population scale).
  */
object Concentration {

  /** Lorenz buckets + Gini. Input: one row per entity with an exact
    * integer measure (e.g. cents). Output: `nBuckets` rows
    * (bucket, n, bucket_units, cum_units, cum_share, gini) ordered by
    * bucket, where bucket 1 holds the smallest values (ntile over
    * (units, id) — the id tie-break makes bucket edges deterministic)
    * and gini = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n repeats on every row.
    */
  def lorenzGini(perEntity: DataFrame, idCol: String, unitsCol: String,
      nBuckets: Int = 10): DataFrame = {
    val base = perEntity.select(col(idCol).as("lg_id"),
      col(unitsCol).cast("long").as("lg_units"))
    val ord = Window.orderBy(col("lg_units"), col("lg_id"))
    val ranked = base
      .withColumn("lg_i", row_number().over(ord))
      .withColumn("lg_b", ntile(nBuckets).over(ord))
    val gini = ranked.agg(
        sum((col("lg_i") * col("lg_units")).cast("decimal(38,0)")).as("s_ix"),
        sum(col("lg_units").cast("decimal(38,0)")).as("s_x"),
        count(lit(1)).as("n_all"))
      .select(round(
        lit(2) * col("s_ix").cast("double") /
          (col("n_all") * col("s_x").cast("double")) -
          (col("n_all") + lit(1)).cast("double") / col("n_all"), 6).as("gini"),
        col("s_x"))
    val buckets = ranked.groupBy(col("lg_b").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("lg_units")).as("bucket_units"))
    val wCum = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)
    buckets
      .withColumn("cum_units", sum(col("bucket_units")).over(wCum))
      .crossJoin(broadcast(gini))
      .select(col("bucket"), col("n"), col("bucket_units"), col("cum_units"),
        round(col("cum_units").cast("double") / col("s_x").cast("double"), 6)
          .as("cum_share"),
        col("gini"))
  }
}
