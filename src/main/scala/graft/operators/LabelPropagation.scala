package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007, made deterministic): every node starts as its own label; each
  * round it adopts the MODE of its neighbors' previous-round labels,
  * ties broken toward the smallest label. A fixed round count with
  * synchronous updates and a total tie-break makes the result an exact,
  * engine-replayable function of the edge set — no randomized visit
  * order (the usual LPA nondeterminism) anywhere.
  *
  * 100 TB design: each round is the canonical two-shuffle pattern —
  * edges⋈labels on the neighbor endpoint (labels is one row per node,
  * the smaller side), then a map-side-combined (node, label) count
  * whose mode resolves in a WindowGroupLimit. Labels persist per round
  * and the previous round unpersists, keeping lineage depth constant
  * (same discipline as [[PageRank]]) — round r never recomputes round
  * r-1. Edges must be provided in both directions for an undirected
  * graph (caller unions reversals, as with [[Bfs]]).
  */
object LabelPropagation {

  /** (node, lbl) after `rounds` synchronous rounds over `edges`
    * (columns `src`, `dst`; labels flow dst → src). Isolated nodes
    * cannot occur (every node comes from the edge list).
    */
  def propagate(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"propagate: rounds must be >= 1, got $rounds")
    val e = edges.select(col("src"), col("dst"))
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count() // materialize round 0 before the loop
    val byNode = Window.partitionBy(col("node"))
      .orderBy(col("c").desc, col("lbl"))
    (1 to rounds).foreach { _ =>
      val prev = labels
      labels = e.join(prev.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"), col("lbl")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(byNode))
        .filter(col("rn") === 1)
        .select(col("node"), col("lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      labels.count()
      prev.unpersist()
    }
    labels
  }

  /** Community size rollup: (community, size), largest first. */
  def communities(edges: DataFrame, rounds: Int): DataFrame =
    propagate(edges, rounds)
      .groupBy(col("lbl").as("community")).agg(count(lit(1)).as("size"))
}
