package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction: score NON-adjacent node pairs by
  * the Jaccard of their neighborhoods — cn / (deg(a) + deg(b) − cn) —
  * the classic "you probably also relate to" primitive (candidate
  * edges for entity graphs, supplier substitution, related-content
  * suggestions). Counts are exact longs; the one division closes the
  * score, so the ranked candidate list hash-replays.
  *
  * Scale shape (100 TB): candidate pairs come from WEDGES (two edges
  * sharing a center), never an all-pairs product; hub centers above
  * `maxCenterDegree` are dropped first — the Σ deg(y)² wedge cost is
  * the power-law hazard, and the cap is the same frequency-cap
  * discipline as [[Dedup]]'s shingle df cap (documented approximation:
  * pairs connected ONLY through super-hubs are not candidates —
  * deliberate, hub co-membership is weak evidence anyway). Degrees are
  * one map-side aggregate; existing edges leave via an anti-join.
  */
object LinkPrediction {

  /** Top-k predicted links over a symmetric edge list (both directions
    * present): (src, dst, cn, deg_src, deg_dst, jaccard r6, rk) with
    * src < dst, ranked by jaccard desc then (src, dst).
    */
  def jaccardTopK(edges: DataFrame, k: Int, maxCenterDegree: Long): DataFrame = {
    require(k >= 1 && maxCenterDegree >= 1, s"k=$k maxCenterDegree=$maxCenterDegree")
    val e = edges.select(col("src").as("a"), col("dst").as("b"))
    val deg = e.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val okCenters = deg.filter(col("deg") <= maxCenterDegree).select(col("node"))
    // wedges x—y—z with x < z, through capped centers only
    val e1 = e.select(col("a").as("x"), col("b").as("y"))
      .join(okCenters.withColumnRenamed("node", "y"), "y")
    val e2 = e.select(col("a").as("y"), col("b").as("z"))
    val cn = e1.join(e2, "y")
      .filter(col("x") < col("z"))
      .groupBy(col("x"), col("z")).agg(count(lit(1)).as("cn"))
    val existing = e.filter(col("a") < col("b"))
      .select(col("a").as("x"), col("b").as("z"))
    val candidates = cn.join(existing, Seq("x", "z"), "left_anti")
      .join(deg.select(col("node").as("x"), col("deg").as("deg_src")), "x")
      .join(deg.select(col("node").as("z"), col("deg").as("deg_dst")), "z")
      .withColumn("jaccard",
        round(col("cn").cast("double") /
          (col("deg_src") + col("deg_dst") - col("cn")).cast("double"), 6))
    TopK.perGroup(candidates.withColumn("_g", lit(1)),
        partitionBy = Seq(col("_g")),
        orderBy = Seq(col("jaccard").desc, col("x"), col("z")), k = k)
      .select(col("x").as("src"), col("z").as("dst"), col("cn"),
        col("deg_src"), col("deg_dst"), col("jaccard"), col("rk"))
      .orderBy(col("rk"))
  }
}
