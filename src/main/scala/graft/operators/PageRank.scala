package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank in exact scaled-integer arithmetic: ranks
  * are longs scaled by `scale` (1.0 ≡ scale), per-edge contributions
  * are floor-divided by out-degree, and the damping step is
  * `(1-d)·scale + (dNum · Σcontrib) div dDen` — every operation is an
  * integer floor, so two engines iterating the same graph produce
  * bit-identical ranks (the float PageRank everyone ships is
  * order-sensitive in its sums and can never be hash-compared).
  * Web-graph centrality is the standard corpus-curation quality prior
  * (harmonic centrality / PageRank over the host graph selects crawl
  * frontiers and weights sources); this is that, made auditable.
  *
  * Scale shape (100 TB): per iteration ONE shuffle — contributions
  * aggregate map-side-combined on dst, then left-join back to the node
  * list, both on the same key so AQE reuses the exchange. Ranks are
  * persisted per iteration to keep the plan linear (lineage would
  * otherwise double per round, same discipline as
  * [[Dedup.connectedComponents]]); dangling mass is not redistributed
  * (documented simplification — callers wanting the strict random
  * surfer add a scalar broadcast of the dangling sum).
  */
object PageRank {

  /** @param edges (src string, dst string) directed edge list; every
    *   node must appear as a src at least once (callers with dangling
    *   nodes union reverse edges or self-loops first).
    * @return (node, rank long) after `iterations` damped rounds from a
    *   uniform `scale` start.
    */
  def ranks(edges: DataFrame, iterations: Int = 3, scale: Long = 1000000L,
      dNum: Long = 85L, dDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && scale > 0 && dNum > 0 && dDen >= dNum)
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val base = (scale * (dDen - dNum)) / dDen
    var rank = nodes.withColumn("rank", lit(scale))
    val persisted = scala.collection.mutable.Buffer[DataFrame]()
    for (_ <- 1 to iterations) {
      val contrib = e.join(rank, e("src") === rank("node"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("m"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dNum * coalesce(m, CAST(0 AS BIGINT))) div $dDen"))
            .as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      persisted += rank
    }
    rank.count() // materialize so earlier iterations can release
    persisted.dropRight(1).foreach(_.unpersist())
    e.unpersist()
    rank
  }
}
