package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Percentile-rank quality ensembling: normalize each raw quality
  * signal to its corpus percentile (`percent_rank`), then average the
  * percentiles — the standard way to blend signals with incomparable
  * scales (a length score, a perplexity, a dedup-cluster size) into
  * one selection rank without hand-tuned weights. Complements
  * [[HybridRetrieval]] (which fuses per-QUERY ranks); this fuses
  * corpus-global distributions.
  *
  * Determinism: percent_rank is (rank-1)/(n-1) over exact integer
  * ranks — ties collapse to the same rational on any engine — and the
  * blend is one fixed-order average of those rationals.
  *
  * Scale shape (100 TB): each signal's percentile is ONE global sort
  * of (id, signal) — narrow columns, payloads stay home; the blends
  * join on id. At extreme scale replace the exact sort with
  * approx-quantile bucketing (the [[QuantileBinning]] path) and only
  * the selection boundary needs exact ranks.
  */
object QualityEnsemble {

  /** Blend `signals` (each ranked ascending = worse→better) into
    * (id, blend double r6) plus each signal's percentile r6.
    */
  def percentileBlend(df: DataFrame, idCol: String, signals: Seq[String]): DataFrame = {
    require(signals.nonEmpty)
    val withPr = signals.foldLeft(df.select(col(idCol) +: signals.map(col): _*)) {
      (acc, sig) =>
        // ties intentionally share a percentile (rank semantics) — no
        // tie-break column, or equal signals would rank unequally
        acc.withColumn(s"pr_$sig", percent_rank().over(Window.orderBy(col(sig).asc)))
    }
    val blend = signals.map(sv => col(s"pr_$sv")).reduce(_ + _) / signals.size
    withPr.select(
      (col(idCol) +: signals.map(sv => round(col(s"pr_$sv"), 6).as(s"pr_$sv")))
        :+ round(blend, 6).as("blend"): _*)
  }
}
