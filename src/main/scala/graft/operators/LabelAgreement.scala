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
  * Scale shape (100 TB): the neighbor search is pluggable — this
  * baseline calls [[SimilaritySearch.bruteForceTopK]] (exact, corpus ×
  * queries); at corpus scale run the same audit over
  * [[SimilaritySearch.ivfTopK]] output instead (the join and rollup
  * are identical). The rollup is two map-side-combined aggregations,
  * bounded by |points| then |labels|.
  */
object LabelAgreement {

  /** @return (label, n long points, avg_match double r6 — mean same-
    *   label neighbors out of k, n_suspect long — points with strict-
    *   minority agreement, matches·2 < k) ordered by label.
    */
  def perLabel(emb: DataFrame, k: Int = 5, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val queries = emb.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val nn = SimilaritySearch.bruteForceTopK(queries, emb, k,
      corpusId = idCol, corpusVec = vecCol)
    val qLabel = emb.select(col(idCol).as("query_id"), col(labelCol).as("_ql"))
    val nLabel = emb.select(col(idCol), col(labelCol).as("_nl"))
    nn.join(nLabel, idCol)
      .join(broadcast(qLabel), "query_id")
      .groupBy(col("query_id"), col("_ql"))
      .agg(sum(when(col("_nl") === col("_ql"), 1L).otherwise(0L)).as("matches"))
      .groupBy(col("_ql").as("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("matches")), 6).as("avg_match"),
        sum(when(col("matches") * 2 < k, 1L).otherwise(0L)).as("n_suspect"))
      .orderBy(col("label"))
  }
}
