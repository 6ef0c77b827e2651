package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension embedding diagnostics: mean and variance of every
  * vector dimension across the corpus, ranked by variance — the check
  * that finds dead dimensions (variance ≈ 0: wasted bytes in every
  * index) and dominant ones (candidates for rotation/whitening before
  * PQ), complementing [[EmbeddingDrift]]'s per-group centroid view
  * with a per-coordinate corpus view.
  *
  * Determinism contract: float coordinates widen to double exactly,
  * then quantize to integer micros, so all moment sums are exact longs
  * and the variance RANKING compares the integer numerator
  * n·Σx² − (Σx)² — no float enters until the final displayed division.
  *
  * Scale shape: one posexplode + map-side-combined groupBy to a
  * dim-count frame (64–4096 rows however large the corpus); top-k by
  * variance is a TakeOrdered on that frame.
  */
object EmbeddingProfile {

  /** Top-`k` dimensions by variance: (dim, n, mean, variance), ties on
    * the integer variance numerator break to the lower dim index.
    */
  def topVarianceDims(embeddings: DataFrame, vecCol: String, k: Int = 10): DataFrame = {
    val exploded = embeddings
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim"), round(col("x").cast("double") * 1000000).cast("long").as("v"))
    val m = exploded.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
      .withColumn("var_num", col("n") * col("s2") - col("s1") * col("s1"))
    m.orderBy(col("var_num").desc, col("dim"))
      .limit(k)
      .select(col("dim"), col("n"),
        round(col("s1").cast("double") / col("n") / 1000000.0, 6).as("mean"),
        round(col("var_num").cast("double") / (col("n") * col("n")) / 1.0e12, 6)
          .as("variance"))
  }
}
