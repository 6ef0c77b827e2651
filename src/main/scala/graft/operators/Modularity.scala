package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Newman modularity of a community assignment — the standard quality
  * score for a graph partition (Q ≈ 0: no better than random; Q ≳ 0.3:
  * real community structure). Complements [[LabelPropagation]]: X149
  * PRODUCES a partition, this MEASURES it, closing the loop
  * (propagate → score → accept/iterate) a curation pipeline needs
  * before trusting communities for group-level dedup or splits.
  *
  * Convention: `edges` holds both directions of every undirected edge,
  * so 2m = |edges|. With e_c = directed edges inside community c and
  * d_c = Σ degrees of c's nodes, Q = Σ_c (e_c·2m − d_c²) / (2m)² — the
  * numerator is EXACT integer arithmetic (DECIMAL(38,0) for the squares
  * at scale); the one division happens at the end.
  *
  * 100 TB design: two broadcast-sized joins of the labels table onto
  * the edge list (labels ≤ nodes rows), one groupBy on the community —
  * no quadratic term anywhere; degree and intra-edge counts are
  * map-side-combined longs.
  */
object Modularity {

  /** (community, n_nodes, e_in, d_sum, q_contrib, q): per-community
    * contribution and the total Q replicated on every row (window over
    * the ≤ |communities| aggregate).
    */
  def score(edges: DataFrame, labels: DataFrame): DataFrame = {
    val l = labels.select(col("node"), col("lbl"))
    val byDst = l.select(col("node").as("dst"), col("lbl").as("dst_lbl"))
    val bySrc = l.select(col("node").as("src"), col("lbl").as("src_lbl"))
    // ONE pass over the labeled edge list yields e_in (intra-community
    // edges), d_sum (out-degree sum), 2m AND the coverage guard
    // together: both label joins are LEFT joins, so every edge rides
    // the map-side-combined aggregate exactly once — count(*) summed
    // over the groups IS 2m (no separate edges.count() job scanning
    // the edge list a second time; that extra pass was the round-12/13
    // regression). A null label on either endpoint lands in the same
    // aggregate as an `uncovered` count. Contract: labels must cover
    // every edge endpoint — e_in/d_sum count labeled edges while 2m
    // counts ALL edges, so an unlabeled endpoint would silently
    // deflate the numerators only. True by construction for
    // LabelPropagation output; enforced for arbitrary callers from the
    // tiny per-community aggregate — no separate anti-join job.
    //
    // LAZY localCheckpoint, not persist: the frame is ≤ |communities|
    // rows; the totals head() below is the first action, so one job
    // both computes the aggregate and pins its blocks, the caller's
    // action reads the pinned blocks, and nothing lingers in the
    // CacheManager after the result frame is dropped (ADVICE r13).
    val perCommunity = edges
      .join(bySrc, Seq("src"), "left").join(byDst, Seq("dst"), "left")
      .groupBy(col("src_lbl").as("community"))
      .agg(
        count(when(col("src_lbl") === col("dst_lbl"), 1)).as("e_in"),
        count(col("src_lbl")).as("d_sum"),
        count(lit(1)).as("_edges"),
        count(when(col("src_lbl").isNull || col("dst_lbl").isNull, 1))
          .as("_uncovered"))
      .localCheckpoint(false)
    // guard + 2m in ONE tiny driver-side action on the pinned frame
    val totals = perCommunity.agg(sum(col("_uncovered")), sum(col("_edges"))).head()
    val uncovered = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    require(uncovered == 0L,
      s"Modularity.score: $uncovered edge endpoints have no label — labels " +
        "must cover every edge endpoint (2m counts all edges)")
    val twoM = if (totals.isNullAt(1)) 0L else totals.getLong(1)
    val sizes = l.groupBy(col("lbl").as("community")).agg(count(lit(1)).as("n_nodes"))
    val w = Window.partitionBy(lit(1))
    sizes
      .join(perCommunity.drop("_edges").drop("_uncovered"), Seq("community"), "left")
      .na.fill(0L, Seq("e_in", "d_sum"))
      .withColumn("q_contrib",
        (col("e_in").cast("decimal(38,0)") * twoM -
          col("d_sum").cast("decimal(38,0)") * col("d_sum"))
          .cast("double") / (twoM.toDouble * twoM.toDouble))
      .withColumn("q", sum(col("q_contrib")).over(w))
  }
}
