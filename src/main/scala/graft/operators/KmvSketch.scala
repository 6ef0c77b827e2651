package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values distinct-count sketch: per group, keep the k
  * smallest hash values of the keys; the k-th smallest U estimates the
  * distinct count as (k−1)·M/U (hashes ≈ uniform order statistics on
  * [0, M)) — the bounded-state cousin of HyperLogLog with a fully
  * deterministic, externally replayable hash (Knuth multiplicative,
  * arithmetic any SQL engine can restate — Spark's xxhash64 would be
  * opaque to the oracle).
  *
  * Scale shape: state is k values per group however many rows/keys
  * arrive. The (group, hash) dedup is a map-side-combined aggregate;
  * the k-smallest selection is a rank window that Catalyst executes as
  * WindowGroupLimit (per-partition top-k BEFORE the shuffle — the
  * q_sample_group_topk plan shape), so no group's full hash set ever
  * materializes. Sketches merge by unioning hash sets and re-taking
  * the k smallest — associative, partition-friendly.
  *
  * The exact distinct count rides along for the error report; at
  * 100 TB that column is the expensive one and gets dropped.
  */
object KmvSketch {

  private val M = 4294967296L // 2^32 hash space

  /** Per-group (grp, n_exact, est, rel_err): KMV estimate vs exact
    * distinct count of `keyCol`. Groups with fewer than k distinct
    * hashes report their exact set size (the sketch is lossless below
    * k). `keyCol` must be integral and non-negative.
    */
  def distinctEstimate(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2")
    val hashes = df
      .select(col(groupCol).as("grp"),
        pmod(col(keyCol).cast("long") * 2654435761L, lit(M)).as("h"))
      .distinct()
    val wRank = Window.partitionBy(col("grp")).orderBy(col("h"))
    val sketch = hashes
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .groupBy(col("grp")).agg(max(col("h")).as("hk"), count(lit(1)).as("m"))
    val exact = df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(keyCol)).as("n_exact"))
    val estRaw = when(col("m") < k, col("m").cast("double"))
      .otherwise(lit((k - 1).toDouble * M) / col("hk"))
    sketch.join(exact, Seq("grp"))
      .withColumn("est_raw", estRaw)
      .select(col("grp"), col("n_exact"),
        round(col("est_raw"), 2).as("est"),
        round(abs(col("est_raw") - col("n_exact")) / col("n_exact"), 4).as("rel_err"))
  }
}
