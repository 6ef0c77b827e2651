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
    val twoM = edges.count()
    val l = labels.select(col("node"), col("lbl"))
    val byDst = l.select(col("node").as("dst"), col("lbl").as("dst_lbl"))
    val bySrc = l.select(col("node").as("src"), col("lbl").as("src_lbl"))
    // ONE pass over the labeled edge list yields e_in (intra-community
    // edges), d_sum (out-degree sum) AND the coverage guard together:
    // both label joins are LEFT joins, a null label on either endpoint
    // rides the same map-side-combined aggregate as an `uncovered`
    // count per src-community. Contract: labels must cover every edge
    // endpoint — e_in/d_sum count labeled edges while 2m counts ALL
    // edges, so an unlabeled endpoint would silently deflate the
    // numerators only. True by construction for LabelPropagation
    // output; enforced for arbitrary callers on the tiny per-community
    // aggregate below — no separate anti-join job.
    val perCommunity = edges
      .join(bySrc, Seq("src"), "left").join(byDst, Seq("dst"), "left")
      .groupBy(col("src_lbl").as("community"))
      .agg(
        count(when(col("src_lbl") === col("dst_lbl"), 1)).as("e_in"),
        count(col("src_lbl")).as("d_sum"),
        count(when(col("src_lbl").isNull || col("dst_lbl").isNull, 1))
          .as("_uncovered"))
      .persist()
    val guard = perCommunity.agg(sum(col("_uncovered"))).head()
    require(guard.isNullAt(0) || guard.getLong(0) == 0L,
      s"Modularity.score: ${if (guard.isNullAt(0)) 0L else guard.getLong(0)} edge " +
        "endpoints have no label — labels must cover every edge endpoint " +
        "(2m counts all edges)")
    val sizes = l.groupBy(col("lbl").as("community")).agg(count(lit(1)).as("n_nodes"))
    val w = Window.partitionBy(lit(1))
    sizes
      .join(perCommunity.drop("_uncovered"), Seq("community"), "left")
      .na.fill(0L, Seq("e_in", "d_sum"))
      .withColumn("q_contrib",
        (col("e_in").cast("decimal(38,0)") * twoM -
          col("d_sum").cast("decimal(38,0)") * col("d_sum"))
          .cast("double") / (twoM.toDouble * twoM.toDouble))
      .withColumn("q", sum(col("q_contrib")).over(w))
  }
}
