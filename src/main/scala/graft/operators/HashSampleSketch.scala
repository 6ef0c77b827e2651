package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bottom-k-by-hash sample → quantile summary: rank every row by a
  * deterministic hash of its key, keep the k smallest ranks, and read
  * order statistics off the sorted sample. The fixed hash makes the
  * sample a UNIFORM k-subset that is independent of partitioning and
  * CLOSED UNDER MERGE (union two nodes' bottom-k sets, re-keep k — the
  * KMV construction applied to whole rows), so the same summary works
  * per-partition, per-day, and across a 1000-executor union without
  * coordination. That is the property the classical deterministic
  * quantile sketches (GK, KLL with random compaction) give up: their
  * state depends on arrival order, so no external engine can replay
  * them. This one hash-replays bit-for-bit (house md5 rank convention,
  * exact in DuckDB too).
  *
  * Scale shape (100 TB): the sample selection is a TakeOrderedAndProject
  * (per-partition top-k, then a k-row driver merge — no global sort, no
  * full shuffle); everything after runs on k rows. Accuracy is the
  * standard uniform-sample bound: |F(est_p) − p| = O(1/√k) w.h.p.
  * (property-tested in HashSampleSketchSpec).
  */
object HashSampleSketch {

  /** Deterministic rank: the house md5→long convention (15 hex chars
    * < 2^60, ANSI-safe) over the row's key expression.
    */
  def rankOf(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** The k rows of smallest (rank, value) — a uniform k-sample of the
    * rows, reproducible across runs, partitionings, and engines.
    * Output: (_rk long, value double).
    */
  def bottomK(df: DataFrame, key: Column, value: Column, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    // fan out before the per-row md5 rank + TakeOrdered's per-partition
    // heap — fused onto the one-task scan otherwise (guide §2.5)
    ScanFanout.byKey(df, key)
      .select(rankOf(key).as("_rk"), value.cast("double").as("value"))
      .orderBy(col("_rk"), col("value"))
      .limit(k)
  }

  /** Quantile estimates at `probs` from the bottom-k sample: the sorted
    * sample's element at index floor(p·(n−1)) (lower-interpolation
    * order statistic — element-valued, so ties and replays are exact).
    * Output: (p double, est double, n_sample long), ordered by p.
    */
  def quantiles(df: DataFrame, key: Column, value: Column, k: Int,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    val sample = bottomK(df, key, value, k)
    // k rows — the single-partition window is bounded by construction
    val w = Window.orderBy(col("value"), col("_rk"))
    val sorted = sample
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(lit(1))))
    val spark = df.sparkSession
    import spark.implicits._
    val ps = probs.map(p => (p, p)).toDF("p", "_p")
    sorted.join(ps, col("_rn") === floor(col("_p") * (col("_n") - 1)) + 1)
      .select(col("p"), col("value").as("est"), col("_n").cast("long").as("n_sample"))
      .orderBy(col("p"))
  }

  /** Per-group quantile estimates: the same bottom-k-by-hash summary
    * independently per `group` value. Selection rides a
    * WindowGroupLimit (per-partition k before the shuffle) instead of
    * a global TakeOrdered; groups smaller than k report exact order
    * statistics (the sample is lossless there). Output:
    * (group, p, est, n_sample), ordered by (group, p).
    */
  def quantilesByGroup(df: DataFrame, group: Column, key: Column, value: Column,
      k: Int, probs: Seq[Double]): DataFrame = {
    require(k >= 1 && probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    val spark = df.sparkSession
    import spark.implicits._
    // fan out (guide §2.5): the per-row md5 rank AND the WindowGroupLimit
    // per-partition selection both run on the scan's partitioning
    val ranked = ScanFanout.byKey(df, key)
      .select(group.as("group"), rankOf(key).as("_rk"),
      value.cast("double").as("value"))
    val wSel = Window.partitionBy(col("group")).orderBy(col("_rk"), col("value"))
    val sample = ranked
      .withColumn("_sel", row_number().over(wSel)).filter(col("_sel") <= k)
    val wOrd = Window.partitionBy(col("group")).orderBy(col("value"), col("_rk"))
    val sorted = sample
      .withColumn("_rn", row_number().over(wOrd))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("group"))))
    val ps = probs.map(p => (p, p)).toDF("p", "_p")
    sorted.join(ps, col("_rn") === floor(col("_p") * (col("_n") - 1)) + 1)
      .select(col("group"), col("p"), col("value").as("est"),
        col("_n").cast("long").as("n_sample"))
      .orderBy(col("group"), col("p"))
  }
}
