package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle listing on an undirected graph — the basic clustering /
  * community signal (a co-occurrence graph's triangles are its tightly
  * coupled item sets; a near-dup graph's triangles are clusters a
  * pairwise threshold alone can't see). Uses the classic ordered-edge
  * join: with every edge stored once as u < v, a triangle a<b<c is
  * found exactly once as (a,b)⋈(b,c)⋈(a,c) — no double counting, no
  * direction bookkeeping.
  *
  * Scale shape (100 TB): wedge generation joins on the middle vertex,
  * so cost is Σ deg(v)² over the ORDERED graph — the u<v orientation
  * caps the effective degree of hubs at their higher-ordered neighbor
  * count, the standard mitigation that makes this tractable on
  * power-law graphs. The closing check is one more equi-join on the
  * (a,c) edge key. Both are plain shuffles; dense mega-hubs should be
  * degree-capped upstream (same discipline as
  * [[AssociationRules.topLift]]'s maxBasket).
  */
object Triangles {

  /** List all triangles (a < b < c). `edges` must hold each undirected
    * edge once with u < v (callers with raw pairs normalize via
    * least/greatest + distinct first).
    */
  def listTriangles(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    val wedges = e.select(col("u").as("a"), col("v").as("b"))
      .join(e.select(col("u").as("b"), col("v").as("c")), "b")
    wedges.join(e.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-node local clustering coefficient: 2·tri(v) / (deg(v)·(deg(v)−1)),
    * 0 for degree < 2 — how close each node's neighborhood is to a
    * clique. High-coefficient regions are genuine communities; a
    * high-degree node with near-zero coefficient is the spam/link-farm
    * shape (connects everywhere, embeds nowhere), the complement signal
    * to [[KCore]] in graph-based corpus curation.
    *
    * One triangle enumeration (the oriented wedge join above) exploded
    * to its three corners plus one degree aggregation — both map-side
    * combined; the triple count and degrees stay exact longs, so only
    * the final ratio is floating point.
    *
    * @return (node, deg long, tri long, coeff double r6) ordered by node.
    */
  def nodeClustering(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val tri = listTriangles(e)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), col("deg"), coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("coeff",
        when(col("deg") >= 2,
          round((lit(2.0) * col("tri")) / (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)))
      .orderBy(col("node"))
  }
}
