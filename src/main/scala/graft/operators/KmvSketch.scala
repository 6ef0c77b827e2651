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

  /** The shared sketch builder: (grp, h) rows, at most k per group —
    * distinct Knuth hashes ranked ascending through WindowGroupLimit.
    * NULL keys are dropped HERE: a null hash would rank FIRST under
    * Spark's nulls-first ascending sort and displace a real hash from
    * the sketch, while an external replay's NULLS LAST would exclude
    * it — the one ordering divergence between engines, closed at the
    * source (SQL count-distinct semantics ignore nulls anyway).
    */
  private def sketchOf(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2")
    val hashes = df
      .filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("grp"),
        pmod(col(keyCol).cast("long") * 2654435761L, lit(M)).as("h"))
      .distinct()
    val wRank = Window.partitionBy(col("grp")).orderBy(col("h"))
    hashes
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("grp"), col("h"))
  }

  /** Per-group (grp, n_exact, est, rel_err): KMV estimate vs exact
    * distinct count of `keyCol`. Groups with fewer than k distinct
    * hashes report their exact set size (the sketch is lossless below
    * k). `keyCol` must be integral and non-negative.
    */
  def distinctEstimate(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 64): DataFrame = {
    val sketch = sketchOf(df, groupCol, keyCol, k)
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

  /** KMV SET ALGEBRA across segments: for every unordered pair of
    * groups, estimate |A ∪ B|, Jaccard(A, B) and |A ∩ B| from the two
    * groups' k-minimum-values sketches alone — the standard KMV
    * union/intersection estimator (merge the two sketches, re-take the
    * k smallest; the fraction ρ of that union sketch present in BOTH
    * input sketches estimates Jaccard; ρ · est|A∪B| estimates the
    * intersection). Below k on all sides the sketch is lossless and
    * every estimate is EXACT (`KmvSetOpsSpec` pins both regimes).
    *
    * Why it matters at 100 TB: overlap questions across N corpus
    * segments ("how many users does every pair of event types share")
    * need only the N sketches of k longs each — never a pairwise
    * distinct-join of the raw corpus. Sketches are built once (same
    * map-side-combined dedup + WindowGroupLimit top-k as
    * [[distinctEstimate]]), the pair grid is |groups|² rows, and each
    * pair's merge touches ≤ 2k hashes. Fully deterministic hash, so an
    * external SQL engine replays every output bit.
    *
    * Output per pair (ga < gb): m_union, hk_union, inter_k (hashes of
    * the union sketch present in both inputs), est_union, est_jaccard,
    * est_intersect.
    */
  def setOpsPairwise(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 64): DataFrame = {
    val sketch = sketchOf(df, groupCol, keyCol, k)
    val groups = sketch.select(col("grp")).distinct()
    // the pair grid is |groups|² — broadcast-scalar by construction
    val pairs = groups.select(col("grp").as("ga"))
      .crossJoin(broadcast(groups.select(col("grp").as("gb"))))
      .filter(col("ga") < col("gb"))
    val sideA = pairs.join(sketch.withColumnRenamed("grp", "ga"), Seq("ga"))
      .select(col("ga"), col("gb"), col("h"), lit(1).as("ina"), lit(0).as("inb"))
    val sideB = pairs.join(sketch.withColumnRenamed("grp", "gb"), Seq("gb"))
      .select(col("ga"), col("gb"), col("h"), lit(0).as("ina"), lit(1).as("inb"))
    val wPair = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val merged = sideA.unionByName(sideB)
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
      .withColumn("rn", row_number().over(wPair))
      .filter(col("rn") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("m_union"), max(col("h")).as("hk_union"),
        sum(col("ina") * col("inb")).as("inter_k"))
    val estU = when(col("m_union") < k, col("m_union").cast("double"))
      .otherwise(lit((k - 1).toDouble * M) / col("hk_union"))
    merged
      .withColumn("est_u_raw", estU)
      .withColumn("jac_raw", col("inter_k") / col("m_union"))
      .select(col("ga"), col("gb"), col("m_union"), col("hk_union"), col("inter_k"),
        round(col("est_u_raw"), 2).as("est_union"),
        round(col("jac_raw"), 6).as("est_jaccard"),
        round(col("jac_raw") * col("est_u_raw"), 2).as("est_intersect"))
  }
}
