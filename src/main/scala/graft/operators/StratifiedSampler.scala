package graft.operators

import graft.ml.RandomUnderSampler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic per-stratum sampling (P10 generalized): keep a row iff
  * its multiplicative-hash score — `RandomUnderSampler.hashKeepScore`,
  * the engine's reproducible, ANSI-SQL-portable sampling primitive — is
  * below its stratum's fraction. A single codegen'd projection + filter:
  * no shuffle, no `rand()`, identical results across runs, partitionings
  * and engines, which is what makes sampling auditable at corpus scale
  * (the reference's `sample()` draws from a seeded RNG whose stream
  * depends on partitioning, `src/random_undersampler.py:66`, and cannot
  * be replayed externally).
  */
object StratifiedSampler {

  /** @param fractions  keep-fraction per stratum value; strata absent
    *                   from the map fall back to `defaultFraction`.
    */
  def sample(df: DataFrame, strataCol: String, fractions: Map[String, Double],
      idCol: String, seed: Long = 42L, defaultFraction: Double = 0.0): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0, 1]")
    val frac: Column = fractions.foldLeft(lit(defaultFraction): Column) {
      case (acc, (k, f)) => when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(RandomUnderSampler.hashKeepScore(col(idCol), seed) < frac)
  }

  /** Deterministic k-per-stratum sample ("reservoir" with a replayable
    * stream): the k rows with the smallest hash score per stratum — a
    * uniform without-replacement sample that is identical across runs,
    * partitionings, and engines. Rides [[TopK.perGroup]], so Spark plans
    * a WindowGroupLimit: each map task keeps at most k rows per stratum
    * BEFORE the shuffle — at corpus scale the exchange carries
    * O(strata × k × tasks) rows, never the data.
    */
  def samplePerStratum(df: DataFrame, strataCol: String, k: Int,
      idCol: String, seed: Long = 42L): DataFrame =
    TopK.perGroup(
        df.withColumn("_score", RandomUnderSampler.hashKeepScore(col(idCol), seed)),
        partitionBy = Seq(col(strataCol)),
        orderBy = Seq(col("_score"), col(idCol)),
        k = k)
      .drop("_score", "rk")
}
