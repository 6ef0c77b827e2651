package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * Norms are precomputed once per vector on each side, so the per-pair
  * hot loop is a single dot product (array aggregates evaluate
  * interpreted — evaluating three per pair tripled the dominant cost).
  */
object SimilaritySearch {

  private def withNorm(df: DataFrame, id: String, vec: String,
      vOut: String, nOut: String): DataFrame =
    df.select(col(id), toDoubleArray(col(vec)).as(vOut))
      .withColumn(nOut, norm(col(vOut)))

  private def cosineFromNorms(va: Column, vb: Column, na: Column, nb: Column): Column =
    when(na * nb === 0.0, lit(0.0)).otherwise(dot(va, vb) / (na * nb))

  /** Exact top-k by cosine for each query vector.
    *
    * `fanOutCorpus` (guide §2.5): hash-repartition the streamed corpus
    * side before the |corpus|×|queries| cosine loop — the loop runs
    * fused onto the corpus scan, which plans as ONE task over a
    * single-row-group parquet file. Callers with a LARGE query batch
    * (the corpus×corpus audit in [[LabelAgreement.perLabel]]: measured
    * 5.9 → 1.4 s at sf0.1) opt in; for small query batches the loop is
    * trivial and the added exchange is pure overhead (measured +0.5 s
    * on the k≤8-query q_ann_* probes), so the default is off.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      queryId: String = "query_id", corpusId: String = "vec_id",
      queryVec: String = "qv", corpusVec: String = "embedding",
      fanOutCorpus: Boolean = false): DataFrame = {
    val cSrc = if (fanOutCorpus) ScanFanout.byKey(corpus, col(corpusId)) else corpus
    val c = withNorm(cSrc, corpusId, corpusVec, "_cv", "_cn")
    val q = withNorm(queries, queryId, queryVec, "_qv", "_qn")
    val scored = c.crossJoin(broadcast(q))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cosine", cosineFromNorms(col("_qv"), col("_cv"), col("_qn"), col("_cn")))
    TopK.perGroup(scored,
        partitionBy = Seq(col(queryId)),
        orderBy = Seq(col("cosine").desc, col(corpusId)),
        k = k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rk"))
  }

  /** Symmetric-distance ANN over int8 codes (SDC): rank by the exact
    * integer dot product of [[VectorQuantization]] codes. At corpus
    * scale this is the cheap first-stage scan — it reads ¼ the bytes of
    * float32 and its hot loop is integer multiply-add — typically
    * followed by exact re-ranking of the survivors; recall against the
    * float ranking (q_ann_quantized_recall) is the quality metric of the
    * uniform-scale approximation. Integer scores make the ranking
    * bit-exact and externally replayable, unlike float-sum orderings.
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      queryId: String = "query_id", corpusId: String = "vec_id",
      queryCodes: String = "qcodes", corpusCodes: String = "codes"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("idot",
        aggregate(zip_with(col(queryCodes), col(corpusCodes),
          (x, y) => (x * y).cast("long")), lit(0L), (acc, p) => acc + p))
    TopK.perGroup(scored,
        partitionBy = Seq(col(queryId)),
        orderBy = Seq(col("idot").desc, col(corpusId)),
        k = k)
      .select(col(queryId), col(corpusId), col("idot"), col("rk"))
  }

  /** Two-stage retrieval — the production ANN shape at corpus scale:
    * the cheap int8-code scan ([[quantizedTopK]], ¼ the scan bytes,
    * integer multiply-add hot loop) selects a per-query `shortlist`,
    * and ONLY those candidates are re-ranked by exact cosine. The
    * float-vector corpus is read through ONE streaming scan probed by a
    * BROADCAST of the shortlist (|queries|·shortlist ids by
    * construction — explicitly hinted, so a size misestimate of the
    * windowed candidate subtree can never pick a sort-merge join that
    * shuffles the corpus), and norms/dot products are computed only for
    * the shortlisted rows — which is what makes exact re-ranking
    * affordable over billions of vectors. PlanSpec asserts the
    * broadcast-probe plan shape.
    */
  def twoStageTopK(queries: DataFrame, corpus: DataFrame, k: Int, shortlist: Int,
      queryId: String = "query_id", corpusId: String = "vec_id",
      queryVec: String = "qv", corpusVec: String = "embedding",
      queryCodes: String = "qcodes", corpusCodes: String = "codes"): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val cand = quantizedTopK(
        queries.select(col(queryId), col(queryCodes)),
        corpus.select(col(corpusId), col(corpusCodes)), shortlist,
        queryId, corpusId, queryCodes, corpusCodes)
      .select(col(queryId), col(corpusId))
    val q = withNorm(queries, queryId, queryVec, "_qv", "_qn")
    // corpus streams once; float vectors and norms materialize only for
    // broadcast-hash-join survivors (the shortlist)
    val candVecs = corpus.select(col(corpusId), toDoubleArray(col(corpusVec)).as("_cv"))
      .join(broadcast(cand), Seq(corpusId))
      .withColumn("_cn", norm(col("_cv")))
    val scored = candVecs
      .join(broadcast(q), Seq(queryId))
      .withColumn("cosine", cosineFromNorms(col("_qv"), col("_cv"), col("_qn"), col("_cn")))
    TopK.perGroup(scored,
        partitionBy = Seq(col(queryId)),
        orderBy = Seq(col("cosine").desc, col(corpusId)),
        k = k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rk"))
  }

  /** IVF-bucketed ANN: probe `nProbe` of the centroid partitions.
    * Centroids are the corpus vectors with id ≡ 0 (mod `centroidStep`) —
    * a deterministic stand-in for k-means at equal plan shape (a real
    * k-means fit can be slotted in without changing the query), chosen
    * over hash-order-limit selection because (a) a filter needs no
    * global sort, and (b) it is plain modular arithmetic, so the whole
    * query is expressible in the DuckDB oracle and hash-checked.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroidStep: Int, nProbe: Int,
      queryId: String = "query_id", corpusId: String = "vec_id",
      queryVec: String = "qv", corpusVec: String = "embedding",
      broadcastProbes: Boolean = true): DataFrame =
    ivfTopKFrom(modularCentroids(corpus, centroidStep, corpusId, corpusVec),
      queries, corpus, k, nProbe, queryId, corpusId, queryVec, corpusVec,
      broadcastProbes)

  /** Deterministic "centroids": every centroidStep-th corpus vector —
    * the oracle-expressible stand-in for a k-means fit (same plan shape
    * either way; see [[kmeansCentroids]] for the production fit).
    */
  def modularCentroids(corpus: DataFrame, centroidStep: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame =
    withNorm(corpus, corpusId, corpusVec, "_cv", "_cn")
      .filter(pmod(col(corpusId), lit(centroidStep)) === 0)
      .select(col(corpusId).as("cent_id"), col("_cv").as("cent_v"), col("_cn").as("cent_n"))

  /** K-means centroids for `ivfTopKFrom` — the production IVF fit
    * (MLlib KMeans over the embedding column; deterministic under
    * `seed`). Centroid ids are the cluster indexes.
    */
  def kmeansCentroids(corpus: DataFrame, kCentroids: Int, seed: Long = 42L,
      corpusVec: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val feat = corpus.select(
      array_to_vector(toDoubleArray(col(corpusVec))).as("features"))
    val model = new KMeans().setK(kCentroids).setSeed(seed)
      .setFeaturesCol("features").fit(feat)
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (v, i) => (i.toLong, v.toArray) }
      .toDF("cent_id", "cent_v")
      .withColumn("cent_n", norm(col("cent_v")))
  }

  /** IVF search against an explicit centroid table
    * (cent_id, cent_v: array<double>, cent_n): assignment via map-side
    * max_by, probe join replaces the full scan — the plan is identical
    * whatever produced the centroids (modulo rule, k-means, ...).
    */
  def ivfTopKFrom(centroids: DataFrame, queries: DataFrame, corpus: DataFrame,
      k: Int, nProbe: Int,
      queryId: String = "query_id", corpusId: String = "vec_id",
      queryVec: String = "qv", corpusVec: String = "embedding",
      broadcastProbes: Boolean = true): DataFrame =
    probeIvfIndex(buildIvfIndex(centroids, corpus, corpusId, corpusVec),
      centroids, queries, k, nProbe, queryId, corpusId, queryVec, broadcastProbes)

  /** The BUILD half of a stored IVF index: every corpus vector assigned
    * to its single nearest centroid via max_by aggregation — partial
    * (map-side) aggregation collapses the corpus×nCentroids candidate
    * set to one row per corpus vector BEFORE any shuffle; a window
    * formulation would shuffle all nCentroids× rows. Tie-break: highest
    * _sim, then smallest cent_id. The rows carry the vectors and norms
    * (IVF lists store the vectors) — at corpus scale this table is
    * WRITTEN ONCE, `partitionBy("cent_id")`, so the assignment pass (the
    * dominant IVF cost) never re-runs per query batch and probes prune
    * unprobed partitions at the directory level (dynamic partition
    * pruning; asserted in PlanSpec on `q_ann_ivf_stored`).
    */
  def buildIvfIndex(centroids: DataFrame, corpus: DataFrame,
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame =
    // NOT fanned out (round-20 measurement): the assignment loop is
    // |corpus|×|centroids| — cheap — and q_ann_ivf_stored writes this
    // frame partitionBy(cent_id), where 32 input partitions × |cents|
    // directories exploded the file count (2.5 → 8-13 s). The write
    // path, not the assignment, owns the layout decision.
    withNorm(corpus, corpusId, corpusVec, "_cv", "_cn")
      .crossJoin(broadcast(centroids))
      .withColumn("_sim", cosineFromNorms(col("_cv"), col("cent_v"), col("_cn"), col("cent_n")))
      .groupBy(col(corpusId))
      .agg(max_by(struct(col("cent_id"), col("_cv").as("v"), col("_cn").as("n")),
        struct(col("_sim"), (-col("cent_id")).as("_nid"))).as("_m"))
      .select(col(corpusId), col("_m.v").as("_cv"), col("_m.n").as("_cn"),
        col("_m.cent_id").as("cent_id"))

  /** The PROBE half: each query finds its nProbe nearest centroids, and
    * an equi-join on centroid id into the (stored) index replaces the
    * full corpus scan. Per query batch the cost is |queries|×nCentroids
    * centroid scoring plus a broadcast probe into ~nProbe/nCentroids of
    * the index — the daily-serving shape over a once-built index.
    */
  /** Each query's nProbe nearest centroids: (queryId, _qv, _qn,
    * cent_id) — the shared front half of every IVF probe path.
    */
  def centroidProbes(queries: DataFrame, centroids: DataFrame, nProbe: Int,
      queryId: String = "query_id", queryVec: String = "qv"): DataFrame = {
    val q = withNorm(queries, queryId, queryVec, "_qv", "_qn")
    TopK.perGroup(
        q.crossJoin(broadcast(centroids))
          .withColumn("_sim",
            cosineFromNorms(col("_qv"), col("cent_v"), col("_qn"), col("cent_n"))),
        partitionBy = Seq(col(queryId)),
        orderBy = Seq(col("_sim").desc, col("cent_id")), k = nProbe)
      .select(col(queryId), col("_qv"), col("_qn"), col("cent_id"))
  }

  /** `broadcastProbes = true` is the serving shape (a query batch is
    * small — ship it to the index partitions). Pass false when the
    * query set is corpus-sized (e.g. an all-points self-audit): the
    * probe frame then carries every corpus vector, and AQE must pick
    * the join strategy instead of a hardwired broadcast.
    */
  def probeIvfIndex(index: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int,
      queryId: String = "query_id", corpusId: String = "vec_id",
      queryVec: String = "qv", broadcastProbes: Boolean = true): DataFrame = {
    val probes0 = centroidProbes(queries, centroids, nProbe, queryId, queryVec)
    val probes = if (broadcastProbes) broadcast(probes0) else probes0
    val scored = index.join(probes, "cent_id")
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cosine", cosineFromNorms(col("_qv"), col("_cv"), col("_qn"), col("_cn")))
    TopK.perGroup(scored,
        partitionBy = Seq(col(queryId)),
        orderBy = Seq(col("cosine").desc, col(corpusId)), k = k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rk"))
  }
}
