package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling WITHOUT replacement in one pass (Efraimidis &
  * Spirakis 2006, exponential-jump formulation): each row draws
  * `key = -ln(u) / w` with u uniform in (0, 1]; the k SMALLEST keys are
  * a weighted sample without replacement — the standard way to select a
  * quality-weighted corpus subset in a single scan.
  *
  * u is derived from md5(id:seed), not rand(): the sample is a pure
  * function of (id, seed), so it is reproducible across runs, engines,
  * and re-partitions — a training-data sample you can re-derive and
  * audit — and the whole operator replays in the DuckDB oracle.
  *
  * Scale shape (100 TB): one scan computes keys; the k smallest arrive
  * via sort-limit, which Catalyst executes as TakeOrderedAndProject —
  * each partition keeps its local top-k heap, only nPartitions·k rows
  * reach the driver-side merge; no full sort, no global shuffle.
  */
object WeightedSampler {

  private val Scale = 4503599627370496.0 // 2^52 — 13 hex chars of md5

  /** @param weightCol strictly positive weights; larger ⇒ more likely
    * @return the k sampled rows: (idCol, weightCol, key, rk), rk 1..k in
    *         selection order
    */
  def sampleWithoutReplacement(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    // (h+1)/2^52 ∈ (0,1] — the +1 keeps ln away from 0
    val h = conv(substring(md5(concat_ws(":", col(idCol), lit(seed)).cast("binary")), 1, 13), 16, 10)
      .cast("long")
    val keyed = df.select(col(idCol), col(weightCol),
      (-log((h + 1).cast("double") / Scale) / col(weightCol)).as("key"))
    keyed
      .orderBy(col("key"), col(idCol))
      .limit(k)
      .withColumn("rk", row_number().over(Window.orderBy(col("key"), col(idCol))))
  }
}
