package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bounded-round k-core peeling: iteratively remove every node whose
  * current degree is below k. The k-core is the standard graph-density
  * filter in corpus curation (link-farm and spam subgraphs have low
  * core numbers; genuine hub communities survive) and in
  * entity-resolution QA (a match cluster that collapses under peeling
  * was glued by weak edges).
  *
  * Rounds are FIXED rather than run-to-fixpoint so the operator is
  * replayable round-for-round by an external SQL engine (the same
  * unrolling discipline as [[PageRank]]); real datasets converge in a
  * handful of rounds because each round can only remove nodes whose
  * degree was dragged down by the previous one.
  *
  * Scale shape (100 TB): DEGREE-DELTA peeling. The edge list is
  * scanned in full exactly once (the round-1 degree aggregate); every
  * later round only counts edges INTO the just-removed node set —
  * deg_{r+1}(v) = deg_r(v) − |edges v→removed_r| — via one equi-join
  * of the cached edge list against the (typically tiny, AQE-broadcast)
  * removed frame plus a node-sized join. Nothing corpus-sized is
  * re-persisted per round (the previous shape re-filtered and
  * re-cached the full edge list twice per round — the dominant cost at
  * sf0.1 and a 2×rounds write amplification at scale). Per-round state
  * is one materialized |surviving nodes| degree frame, so the whole
  * peel runs rounds+2 jobs; the count is pinned in GraphOpsSpec.
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
    val edges = pairs
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the ONE full-degree pass, materialized EAGERLY (also fills the
    // edge cache): handing AQE a finished stage here lets it size every
    // later round's joins; making this lazy too measured ~1.5x slower
    // (the whole peel as one blind-planned job). Every node appears
    // (it has >= 1 edge by construction).
    var deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    deg.count()
    val removed = scala.collection.mutable.Buffer[DataFrame]()
    val pinned = scala.collection.mutable.Buffer[DataFrame](edges, deg)
    for (r <- 1 to rounds) {
      val dropped = deg.filter(col("deg") < k)
      removed += dropped
        .select(col("node"), lit(r).as("removed_round"), lit(0L).as("deg"))
      // degree delta: only neighbors of just-removed nodes lose degree.
      // Each edge (s, d) is subtracted exactly once — in the round d is
      // removed; edges whose s was removed earlier no longer have a
      // row in `deg` to subtract from.
      val delta = edges
        .join(dropped.select(col("node").as("dst")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(count(lit(1)).as("_d"))
      deg = deg.filter(col("deg") >= k)
        .join(delta, Seq("node"), "left")
        .select(col("node"),
          (col("deg") - coalesce(col("_d"), lit(0L))).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // LAZY persist: registration alone breaks the fan-out re-compute
      // (each deg frame is read by the removed filter, the delta join
      // and the next round — block-store dedup computes it once inside
      // the single materializing job); an eager count() here spent one
      // scheduling job per round on a node-sized frame, and AQE still
      // sizes the delta join at its own shuffle-stage boundary
      pinned += deg
    }
    // survivors carry their degree in the final surviving subgraph —
    // deg after `rounds` subtractions IS that degree (a survivor whose
    // neighbors were all removed reads 0 through the left-join path)
    val survivors = deg.select(col("node"), lit(0).as("removed_round"), col("deg"))
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
