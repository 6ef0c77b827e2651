package graft.operators

import org.apache.spark.sql.DataFrame
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
  * the smaller side, AQE-broadcast when it fits), then a map-side-
  * combined (node, label) count whose mode resolves in a second
  * map-side-combined ARGMIN aggregate (no per-node sort anywhere).
  * Each intermediate round is consumed EXACTLY ONCE (by the next
  * round), so rounds chain inside one multi-stage Spark job; labels
  * persist only every [[checkpointEvery]] rounds — bounding lineage
  * depth and planner time for long runs — plus the final round (its
  * consumers are external and unknown). Round-13 profiling showed the
  * old persist+count-per-round discipline spending more wall-clock on
  * job scheduling + cache writes than on the actual aggregation at
  * sf0.1. Edges must be provided in both directions for an undirected
  * graph (caller unions reversals, as with [[Bfs]]); callers looping
  * more than a couple of rounds should persist `edges` themselves (it
  * is re-scanned every round).
  */
object LabelPropagation {

  /** Persist + materialize cadence for intermediate rounds: deep
    * enough that short runs (the common 2-3 round case) execute as a
    * single job, shallow enough that a 20-round run never carries an
    * unbounded lineage chain.
    */
  private val checkpointEvery = 4

  /** (node, lbl) after `rounds` synchronous rounds over `edges`
    * (columns `src`, `dst`; labels flow dst → src). Isolated nodes
    * cannot occur (every node comes from the edge list). The returned
    * frame is persisted and materialized (callers fan out from it).
    *
    * @param edgesDistinct caller-asserted: the edge list carries no
    *   duplicate (src, dst) rows. Then round 1 collapses algebraically
    *   — over identity labels every (node, neighbor-label) count is
    *   exactly 1, so the mode-with-smallest-label tie-break IS
    *   `min(dst)`: one map-side-combined aggregate instead of a join
    *   plus a two-level aggregate, same result bit-for-bit (property-
    *   tested both ways in DriftGraphOpsSpec).
    */
  def propagate(edges: DataFrame, rounds: Int,
      edgesDistinct: Boolean = false): DataFrame = {
    require(rounds >= 1, s"propagate: rounds must be >= 1, got $rounds")
    val e = edges.select(col("src"), col("dst"))
    // round 0 (identity labels) is never materialized: it is one
    // distinct away from the edge list and is consumed exactly once,
    // inside the round-1 join
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    var persisted: DataFrame = null
    (1 to rounds).foreach { r =>
      val prev = labels
      labels =
        if (r == 1 && edgesDistinct)
          e.groupBy(col("src").as("node")).agg(min(col("dst")).as("lbl"))
        else
          // the mode with its deterministic tie-break (max count, then
          // smallest label) is an ARGMIN over (-count, label) — a
          // plain aggregate, not a window
          e.join(prev.withColumnRenamed("node", "dst"), "dst")
            .groupBy(col("src").as("node"), col("lbl")).agg(count(lit(1)).as("c"))
            .groupBy(col("node"))
            .agg(min(struct((-col("c")).as("_nc"), col("lbl").as("lbl"))).as("_m"))
            .select(col("node"), col("_m.lbl").as("lbl"))
      if (r == rounds || r % checkpointEvery == 0) {
        labels = labels.persist(StorageLevel.MEMORY_AND_DISK)
        labels.count()
        if (persisted ne null) persisted.unpersist()
        persisted = labels
      }
    }
    labels
  }

  /** Community size rollup: (community, size), largest first. */
  def communities(edges: DataFrame, rounds: Int,
      edgesDistinct: Boolean = false): DataFrame =
    propagate(edges, rounds, edgesDistinct)
      .groupBy(col("lbl").as("community")).agg(count(lit(1)).as("size"))
}
