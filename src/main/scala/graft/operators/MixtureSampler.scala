package graft.operators

import graft.ml.RandomUnderSampler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-weighted mixture sampling across corpus sources — the
  * "mixture weights" step of assembling a pretraining mix: target
  * proportions ∝ count^alpha (alpha < 1 upweights small sources, the
  * multilingual-sampling trick), realized purely by down-sampling, so
  * rate_s = (c_min / c_s)^(1-alpha) and the smallest source is kept
  * whole.
  *
  * Determinism: row selection uses the engine's replayable
  * multiplicative-hash score ([[RandomUnderSampler.hashKeepScore]] —
  * integer arithmetic, identical across runs/partitionings/engines), and
  * for alpha = 0.5 the rate is sqrt(c_min/c_s), where IEEE-754 sqrt and
  * division make even the float path bit-reproducible in external SQL
  * engines — the whole sample is auditable after the fact.
  *
  * Scale shape for 100 TB: per-source counts are a map-side-combined
  * aggregate over a short key (thousands of sources at most); the rate
  * table is broadcast back; no corpus shuffle, no driver collect. Note
  * `temperatureSample(docs, ...)` necessarily reads `docs` TWICE — once
  * for the counting aggregate, once for the filter pass — so callers
  * should persist `docs` when it is an expensive derived frame (the
  * corpus-pipeline query does), or pre-compute the rate table and call
  * `sampleWithRates` for a strict single pass over the corpus.
  */
object MixtureSampler {

  /** Per-source rate table: (sourceCol, n_docs, _rate). */
  def rates(docs: DataFrame, sourceCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha out of (0, 1]")
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    val cmin = counts.agg(min(col("n_docs")).as("_cmin"))
    counts.crossJoin(broadcast(cmin))
      .select(col(sourceCol), col("n_docs"),
        rate(col("n_docs").cast("double"), col("_cmin").cast("double"), alpha).as("_rate"))
  }

  /** Sampled corpus (all original columns) plus the per-row `_rate`.
    * Scans `docs` twice (count pass + filter pass) — see the scale note
    * above; pass a persisted frame or use [[sampleWithRates]].
    */
  def temperatureSample(docs: DataFrame, sourceCol: String, idCol: String,
      alpha: Double = 0.5, seed: Long = 42L): DataFrame =
    sampleWithRates(docs, rates(docs, sourceCol, alpha), sourceCol, idCol, seed)

  /** The strict one-pass half: filter `docs` against a PRE-COMPUTED rate
    * table (from [[rates]], possibly persisted/stored) — the corpus is
    * touched by exactly one codegen'd filter pass behind a broadcast
    * join.
    */
  def sampleWithRates(docs: DataFrame, rateTable: DataFrame, sourceCol: String,
      idCol: String, seed: Long = 42L): DataFrame =
    docs.join(broadcast(rateTable.select(col(sourceCol), col("_rate"))), sourceCol)
      .filter(RandomUnderSampler.hashKeepScore(col(idCol), seed) < col("_rate"))

  /** rate = (cmin/c)^(1-alpha); the alpha = 0.5 case uses sqrt explicitly
    * (correctly rounded per IEEE 754, unlike general pow) so external
    * engines replay it bit-exactly.
    */
  private def rate(c: org.apache.spark.sql.Column, cmin: org.apache.spark.sql.Column,
      alpha: Double): org.apache.spark.sql.Column =
    if (alpha == 0.5) sqrt(cmin / c) else pow(cmin / c, 1.0 - alpha)
}
