package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bounded-round k-core peeling: iteratively remove every node whose
  * current degree is below k, recomputing degrees on the surviving
  * subgraph each round. The k-core is the standard graph-density filter
  * in corpus curation (link-farm and spam subgraphs have low core
  * numbers; genuine hub communities survive) and in entity-resolution
  * QA (a match cluster that collapses under peeling was glued by weak
  * edges).
  *
  * Rounds are FIXED rather than run-to-fixpoint so the operator is
  * replayable round-for-round by an external SQL engine (the same
  * unrolling discipline as [[PageRank]]); real datasets converge in a
  * handful of rounds because each round can only remove nodes whose
  * degree was dragged down by the previous one.
  *
  * Scale shape (100 TB): each round is one degree aggregation
  * (map-side combined on src) plus two semi-joins that keep only
  * surviving endpoints — all on the same key, so AQE reuses the
  * exchange. Edge and degree frames persist per round to keep lineage
  * linear, and every prior round's blocks release once the next is
  * materialized.
  */
object KCore {

  /** @param pairs undirected edge list (aCol, bCol); symmetrized and
    *   deduplicated internally, so callers pass each edge once.
    * @return one row per original node: (node, removed_round int — the
    *   peel round that removed it, 0 if it survives all rounds,
    *   deg long — degree in the final surviving subgraph, 0 if removed)
    *   ordered by node.
    */
  def peel(pairs: DataFrame, k: Int, rounds: Int = 3,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // symmetrize in ONE scan (explode to both directions), dedup so
    // degree = distinct-neighbor count whatever the caller fed in
    var edges = pairs
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var nodes = edges.select(col("src").as("node")).distinct()
    val removed = scala.collection.mutable.Buffer[DataFrame]()
    val pinned = scala.collection.mutable.Buffer[DataFrame](edges)
    for (r <- 1 to rounds) {
      val deg = nodes
        .join(edges.groupBy(col("src")).agg(count(lit(1)).as("d")),
          nodes("node") === col("src"), "left")
        .select(col("node"), coalesce(col("d"), lit(0L)).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // materialize per round: AQE then sizes the surviving node set at
      // runtime and broadcasts the semi-joins below (see PageRank)
      deg.count()
      pinned += deg
      removed += deg.filter(col("deg") < k)
        .select(col("node"), lit(r).as("removed_round"), lit(0L).as("deg"))
      nodes = deg.filter(col("deg") >= k).select(col("node"))
      edges = edges
        .join(nodes.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(nodes.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
      pinned += edges
    }
    val survivors = nodes
      .join(edges.groupBy(col("src")).agg(count(lit(1)).as("d")),
        nodes("node") === col("src"), "left")
      .select(col("node"), lit(0).as("removed_round"),
        coalesce(col("d"), lit(0L)).as("deg"))
    // eager localCheckpoint, NOT persist+count: unpersisting the
    // per-round frames below would invalidate a CacheManager entry that
    // depends on them (non-cascading invalidation drops the data and
    // lazily re-caches), silently recomputing the whole peel on the
    // caller's first action — checkpoint blocks are RDD-level and immune
    val out = (removed :+ survivors).reduce(_ unionByName _)
      .orderBy(col("node"))
      .localCheckpoint(true)
    pinned.foreach(_.unpersist())
    out
  }
}
