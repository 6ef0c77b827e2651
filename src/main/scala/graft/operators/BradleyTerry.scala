package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry preference strengths from pairwise win counts — the
  * canonical model behind preference-data pipelines (pairwise human
  * judgments → per-item strength): P(i beats j) = w_i/(w_i+w_j),
  * fitted by Hunter's MM iteration w_i ← W_i / Σ_j N_ij/(w_i+w_j)
  * (W_i = total wins, N_ij = decided games between i and j).
  *
  * Determinism: the iteration count is FIXED and each per-opponent
  * term is floored onto an integer grid (⌊N_ij·10⁶/(w_i+w_j)⌋ as a
  * long) before summing, so the denominator is an exact integer sum —
  * order-independent under any partitioning — and every w is a fixed
  * IEEE expression of longs. The whole fit replays hash-identically in
  * external SQL; strengths are reported relative to the strongest item
  * (max-normalized — max is order-independent where a float total
  * would not be).
  *
  * Scale shape (100 TB): games collapse to one (winner, loser) count
  * aggregate (map-side combined); each MM iteration is two broadcast
  * joins of the |items|-row strength table onto the |item-pairs| frame
  * plus one map-side-combined rollup. Nothing row-scale survives the
  * first aggregate.
  */
object BradleyTerry {

  /** Fit over directed decided games `(winCol, loseCol, nCol)` (one
    * row per ordered pair, n = times winCol beat loseCol). Output:
    * (item, n_wins long, n_games long, strength double r6 — max-
    * normalized), strength desc then item.
    */
  def strengths(games: DataFrame, winCol: String, loseCol: String,
      nCol: String, iterations: Int = 2): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    val d = games.select(col(winCol).as("_w"), col(loseCol).as("_l"),
      col(nCol).cast("long").as("_n"))
    // symmetric decided-game counts N_ij, both directions materialized
    val nij = d.select(col("_w").as("_i"), col("_l").as("_j"), col("_n"))
      .unionAll(d.select(col("_l").as("_i"), col("_w").as("_j"), col("_n")))
      .groupBy(col("_i"), col("_j")).agg(sum(col("_n")).as("_nij"))
      .persist()
    val wins = d.groupBy(col("_w").as("_i")).agg(sum(col("_n")).as("_wins"))
    val items = nij.select(col("_i")).distinct()
      .join(wins, Seq("_i"), "left")
      .na.fill(0L, Seq("_wins"))
      .persist()
    var w = items.select(col("_i"), lit(1.0).as("_s"))
    for (_ <- 1 to iterations) {
      val denom = nij
        .join(broadcast(w.select(col("_i"), col("_s").as("_si"))), "_i")
        .join(broadcast(w.select(col("_i").as("_j"), col("_s").as("_sj"))), "_j")
        .withColumn("_t", floor(col("_nij") * 1e6 / (col("_si") + col("_sj"))).cast("long"))
        .groupBy(col("_i")).agg(sum(col("_t")).as("_den"))
      w = items.join(denom, "_i")
        .select(col("_i"),
          (col("_wins").cast("double") * 1e6 / col("_den").cast("double")).as("_s"))
      w = w.localCheckpoint(true) // truncate the per-iteration lineage
    }
    val games2 = nij.groupBy(col("_i")).agg(sum(col("_nij")).as("_games"))
    // eager-materialize the (tiny) report, then release the loop frames
    val out = items.join(w, "_i").join(games2, "_i")
      .join(broadcast(w.agg(max(col("_s")).as("_mx"))))
      .select(col("_i").as("item"), col("_wins").as("n_wins"),
        col("_games").as("n_games"),
        round(col("_s") / col("_mx"), 6).as("strength"))
      .orderBy(col("strength").desc, col("item"))
      .localCheckpoint(true)
    nij.unpersist(); items.unpersist()
    out
  }
}
