package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Percentile-rank quality ensembling: normalize each raw quality
  * signal to its corpus percentile (`percent_rank` semantics), then
  * average the percentiles — the standard way to blend signals with
  * incomparable scales (a length score, a perplexity, a dedup-cluster
  * size) into one selection rank without hand-tuned weights.
  * Complements [[HybridRetrieval]] (which fuses per-QUERY ranks); this
  * fuses corpus-global distributions.
  *
  * Determinism: percent_rank is (rank-1)/(n-1) over exact integer
  * ranks — ties collapse to the same rational on any engine — and the
  * blend is one fixed-order average of those rationals.
  *
  * Scale shape (100 TB): no signal ever sees a corpus-wide
  * single-partition window. Per signal, rows are range-bucketed on
  * sampled value quantiles (equal values always share a bucket, so
  * buckets strictly respect the global value order), one
  * map-side-combined count per bucket becomes an exclusive prefix
  * offset via a window over that TINY frame, and the exact tie-shared
  * `rank()` runs per bucket in parallel — global rank = bucket offset
  * + within-bucket rank, exactly percent_rank's rank because bucket
  * order is total and ties never straddle buckets. The [[Skyline]] /
  * [[BudgetSelection]] bucketed-prefix pattern, applied to ranks.
  */
object QualityEnsemble {

  /** Blend `signals` (each ranked ascending = worse→better) into
    * (id, blend double r6) plus each signal's percentile r6.
    */
  def percentileBlend(df: DataFrame, idCol: String, signals: Seq[String]): DataFrame = {
    require(signals.nonEmpty)
    // base stays persisted for the LIFETIME of the returned frame (the
    // fold result reads it on every action) — a corpus-sized but
    // narrow (id + |signals| numerics) retained cache, the same
    // documented-leak convention as Bfs. Callers that need the memory
    // back drop the result and clearCache().
    val base = df.select(col(idCol) +: signals.map(col): _*).persist()
    val n = base.count()
    val nBuckets = 64
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // ALL boundary sketches run on the persisted base — sketching the
    // accumulating fold frame would recompute every previous signal's
    // bucketing join once per signal (quadratic in |signals| passes).
    // ANY boundary set is correct (it only balances buckets): ranks
    // compose from exact counts.
    val allBounds = signals.map { sig =>
      sig -> base.select(col(sig).cast("double").as("_v"))
        .stat.approxQuantile("_v", probs, 0.01).distinct.sorted
    }.toMap
    val withPr = signals.foldLeft(base.toDF()) { (acc, sig) =>
      val bounds = allBounds(sig)
      // strictly-below count ⇒ equal values share a bucket, and a
      // lower bucket index implies a strictly smaller value
      val bucket = if (bounds.isEmpty) lit(0)
        else size(filter(array(bounds.map(lit(_)): _*), b => b < col(sig).cast("double")))
      val bk = acc.withColumn("_bk", bucket)
      val wOff = Window.orderBy(col("_bk")).rowsBetween(Window.unboundedPreceding, -1)
      val offsets = bk.groupBy(col("_bk")).agg(count(lit(1)).as("_bn"))
        .withColumn("_off", coalesce(sum(col("_bn")).over(wOff), lit(0L)))
        .select(col("_bk"), col("_off"))
      val wIn = Window.partitionBy(col("_bk")).orderBy(col(sig).asc)
      val pr = if (n <= 1) lit(0.0)
        else (col("_off") + rank().over(wIn) - lit(1L)).cast("double") / lit((n - 1).toDouble)
      bk.join(broadcast(offsets), "_bk")
        .withColumn(s"pr_$sig", pr)
        .drop("_bk", "_off")
    }
    val blend = signals.map(sv => col(s"pr_$sv")).reduce(_ + _) / signals.size
    withPr.select(
      (col(idCol) +: signals.map(sv => round(col(s"pr_$sv"), 6).as(s"pr_$sv")))
        :+ round(blend, 6).as("blend"): _*)
  }
}
