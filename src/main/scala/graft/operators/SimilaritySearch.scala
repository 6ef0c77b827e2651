package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k. The query side is expected to
  *    be small and is broadcast, so the corpus streams once with no
  *    shuffle of the corpus itself; per-partition rank-limit (window
  *    group limit) keeps only k rows per query before the final shuffle.
  *  - `ivfTopK`: IVF-style two-stage search — corpus vectors are assigned
  *    to their nearest of `nCentroids` deterministic pseudo-centroids
  *    (sampled corpus vectors); each query probes its `nProbe` nearest
  *    centroids only, turning the scan into an equi-join on centroid id.
  *    Recall < 1, cost ~ nProbe/nCentroids of brute force.
  */
object SimilaritySearch {

  /** Exact top-k by cosine for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      queryId: String = "query_id", corpusId: String = "vec_id",
      queryVec: String = "qv", corpusVec: String = "embedding"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cosine",
        cosineSimilarity(toDoubleArray(col(queryVec)), toDoubleArray(col(corpusVec))))
    TopK.perGroup(scored,
        partitionBy = Seq(col(queryId)),
        orderBy = Seq(col("cosine").desc, col(corpusId)),
        k = k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rk"))
  }

  /** IVF-bucketed ANN: probe `nProbe` of `nCentroids` partitions.
    * Centroids are the corpus vectors whose id hashes lowest — a
    * deterministic stand-in for k-means at equal plan shape (a real
    * k-means fit can be slotted in without changing the query).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int,
      queryId: String = "query_id", corpusId: String = "vec_id",
      queryVec: String = "qv", corpusVec: String = "embedding"): DataFrame = {

    // deterministic "centroids": nCentroids corpus rows by hash order
    val centroids = corpus
      .withColumn("_h", xxhash64(col(corpusId)))
      .orderBy(col("_h"), col(corpusId)).limit(nCentroids)
      .select(col(corpusId).as("cent_id"), toDoubleArray(col(corpusVec)).as("cent_v"))

    // assign each corpus vector to its single nearest centroid via
    // max_by aggregation — partial (map-side) aggregation collapses the
    // corpus×nCentroids candidate set to one row per corpus vector BEFORE
    // any shuffle; the round-1 window formulation shuffled all 16× rows.
    // Tie-break: highest _sim, then smallest cent_id (max of -cent_id).
    val assigned = corpus.crossJoin(broadcast(centroids))
      .withColumn("_sim", cosineSimilarity(toDoubleArray(col(corpusVec)), col("cent_v")))
      .groupBy(col(corpusId))
      .agg(max_by(struct(col("cent_id"), col(corpusVec).as("_cv")),
        struct(col("_sim"), (-col("cent_id")).as("_nid"))).as("_m"))
      .select(col(corpusId), col("_m._cv").as(corpusVec), col("_m.cent_id").as("cent_id"))

    // each query probes its nProbe nearest centroids
    val probes = TopK.perGroup(
        queries.crossJoin(broadcast(centroids))
          .withColumn("_sim", cosineSimilarity(toDoubleArray(col(queryVec)), col("cent_v"))),
        partitionBy = Seq(col(queryId)),
        orderBy = Seq(col("_sim").desc, col("cent_id")), k = nProbe)
      .select(col(queryId), col(queryVec), col("cent_id"))

    // equi-join on centroid id replaces the full scan
    val scored = assigned.join(broadcast(probes), "cent_id")
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cosine",
        cosineSimilarity(toDoubleArray(col(queryVec)), toDoubleArray(col(corpusVec))))
    TopK.perGroup(scored,
        partitionBy = Seq(col(queryId)),
        orderBy = Seq(col("cosine").desc, col(corpusId)), k = k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rk"))
  }
}
