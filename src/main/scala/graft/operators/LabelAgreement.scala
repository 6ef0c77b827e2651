package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** kNN label-agreement audit: for every labeled embedding, count how
  * many of its k nearest neighbors (cosine) share its label, then roll
  * the counts up per label. Low agreement flags PROBABLE LABEL NOISE —
  * the confident-learning signal (Northcutt et al.) that a point
  * sitting in the wrong label's neighborhood is mislabeled — and the
  * per-label averages expose which classes bleed into each other. A
  * standard QA gate before training on weak or distant supervision.
  *
  * Counts stay integers end-to-end (matches per point, suspects per
  * label); the only division is the final per-label mean of longs, so
  * the whole audit hash-replays on an external engine.
  *
  * Scale shape (100 TB): the neighbor search IS pluggable —
  * [[perLabelFrom]] takes any pre-computed (query_id, neighbor id)
  * frame, so the corpus-scale path feeds it
  * [[SimilaritySearch.ivfTopK]] (or a stored-index probe) output and
  * never materializes an all-pairs stage; [[perLabel]] wires in
  * [[SimilaritySearch.bruteForceTopK]] as the EXACT baseline the
  * oracle replays (and the recall monitor diffs against). The rollup
  * is two map-side-combined aggregations, bounded by |points| then
  * |labels|.
  */
object LabelAgreement {

  /** Exact-baseline audit: brute-force cosine kNN (corpus × corpus —
    * oracle/audit scale only; use [[perLabelFrom]] with an ANN frame at
    * corpus scale).
    *
    * @return (label, n long points, avg_match double r6 — mean same-
    *   label neighbors out of k, n_suspect long — points with strict-
    *   minority agreement, matches·2 < k) ordered by label.
    */
  def perLabel(emb: DataFrame, k: Int = 5, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    val queries = emb.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // corpus×corpus: the one caller big enough to want the corpus side
    // fanned out before the cosine loop (see bruteForceTopK scaladoc)
    val nn = SimilaritySearch.bruteForceTopK(queries, emb, k,
      corpusId = idCol, corpusVec = vecCol, fanOutCorpus = true)
    perLabelFrom(nn, emb, k, idCol, labelCol)
  }

  /** The audit over a PRE-COMPUTED neighbor frame — the pluggable-
    * backend entry: `neighbors` must carry (`query_id`, `idCol`) rows,
    * one per retrieved neighbor (any extra columns ignored), from
    * whatever search backend fits the scale (brute force, IVF,
    * stored-index probe). Same output contract as [[perLabel]].
    */
  def perLabelFrom(neighbors: DataFrame, emb: DataFrame, k: Int,
      idCol: String = "vec_id", labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val qLabel = emb.select(col(idCol).as("query_id"), col(labelCol).as("_ql"))
    val nLabel = emb.select(col(idCol), col(labelCol).as("_nl"))
    // no broadcast hint: the label frames are corpus-sized (narrow but
    // |points| rows) — AQE broadcasts them when they fit, shuffles when
    // they don't
    neighbors.select(col("query_id"), col(idCol))
      .join(nLabel, idCol)
      .join(qLabel, "query_id")
      .groupBy(col("query_id"), col("_ql"))
      .agg(sum(when(col("_nl") === col("_ql"), 1L).otherwise(0L)).as("matches"))
      .groupBy(col("_ql").as("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("matches")), 6).as("avg_match"),
        sum(when(col("matches") * 2 < k, 1L).otherwise(0L)).as("n_suspect"))
      .orderBy(col("label"))
  }
}
