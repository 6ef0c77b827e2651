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
}
