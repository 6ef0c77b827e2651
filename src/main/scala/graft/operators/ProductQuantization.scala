package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with asymmetric-distance (ADC) scoring —
  * the vector-compression step between scalar int8 quantization
  * ([[VectorQuantization]]) and IVF bucketing ([[SimilaritySearch]]) in
  * a production ANN stack: a dim-d vector stores as `m` small codebook
  * ids (one per d/m-dim subspace), ~m bytes instead of 4d — at 100 TB
  * the difference between an index that fits executor memory and one
  * that doesn't.
  *
  * - **Codebooks** (`modularCodebooks`): per subspace j, the j-th
  *   subvectors of every `step`-th corpus vector — the deterministic,
  *   oracle-expressible stand-in for per-subspace k-means (same plan
  *   shape; a k-means fit slots in without changing encode/score).
  * - **Encoding** (`encode`): per (vector, subspace), the codebook entry
  *   minimizing squared L2 distance (`min_by` — partial aggregation, no
  *   window), packed to one `codes` array per vector in subspace order —
  *   the compact stored form.
  * - **ADC top-k** (`adcTopK`): each query computes its distance table
  *   to every codebook entry (|q|·m·|codebook| rows — broadcast-sized),
  *   the encoded corpus explodes its codes and probes the table with a
  *   broadcast equi-join on (j, code), and per-(query, vector) distances
  *   sum IN SUBSPACE ORDER (sorted collect + left-to-right aggregate),
  *   so the float result is bit-replayable by the DuckDB oracle's
  *   list_reduce. Approximate distance = Σ_j ‖q_j − cb[j, code_j]‖².
  *
  * All distances derive from the codegen'd [[graft.expressions.DotProduct]]
  * (d² = ⟨a,a⟩ + ⟨b,b⟩ − 2⟨a,b⟩), keeping left-to-right summation on
  * both engines.
  *
  * Ranking fidelity is data-dependent: ADC error is bounded by the
  * codebook reconstruction error, so PQ separates what the codebooks
  * resolve — clusters and coarse neighborhoods — while fine ranking
  * within a spread narrower than the quantization noise (e.g. i.i.d.
  * unit vectors) is genuinely beyond any m-byte code. Production stacks
  * train per-subspace k-means codebooks (slots into `codebooks` without
  * touching encode/score, exactly like [[SimilaritySearch.kmeansCentroids]])
  * and re-rank a PQ shortlist at full precision
  * ([[SimilaritySearch.twoStageTopK]]'s shape). ProductQuantizationSpec
  * asserts the neighborhood-preservation property on clustered data.
  */
object ProductQuantization {

  private def d2(a: Column, b: Column): Column =
    dot(a, a) + dot(b, b) - lit(2.0) * dot(a, b)

  /** Per-subspace codebooks: (j, code_id, cb_v) for every `step`-th
    * corpus vector's j-th subvector. Broadcast-sized by construction
    * (|corpus|/step × m rows).
    */
  def modularCodebooks(corpus: DataFrame, m: Int, subDim: Int, step: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame =
    corpus.filter(pmod(col(corpusId), lit(step)) === 0)
      .select(col(corpusId).as("code_id"), toDoubleArray(col(corpusVec)).as("_v"))
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .select(col("j"), col("code_id"),
        slice(col("_v"), col("j") * subDim + 1, lit(subDim)).as("cb_v"))

  /** Per-subspace K-MEANS codebooks — the production PQ fit (k-means
    * minimizes exactly the reconstruction error that bounds ADC
    * fidelity; ProductQuantizationSpec asserts it beats the modular
    * sample at equal codebook size). m driver-coordinated MLlib fits of
    * k centers each over the subvector projections; deterministic under
    * `seed`. Codebook ids are the cluster indexes. Slots into
    * [[encode]]/[[adcTopK]] unchanged, like
    * [[SimilaritySearch.kmeansCentroids]] does for IVF.
    */
  def kmeansCodebooks(corpus: DataFrame, m: Int, subDim: Int, k: Int,
      seed: Long = 42L, corpusVec: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    (0 until m).flatMap { j =>
      val feat = corpus.select(array_to_vector(
        slice(toDoubleArray(col(corpusVec)), j * subDim + 1, subDim)).as("features"))
      val model = new KMeans().setK(k).setSeed(seed + j)
        .setFeaturesCol("features").fit(feat)
      model.clusterCenters.zipWithIndex.toSeq
        .map { case (c, i) => (j, i.toLong, c.toArray.toSeq) }
    }.toDF("j", "code_id", "cb_v")
  }

  /** Mean squared reconstruction error of a codebook over the corpus —
    * the quantity k-means training minimizes and the bound on ADC
    * ranking fidelity; exposed so index builders can compare codebook
    * fits before committing one to a 100 TB encode pass.
    */
  def reconstructionError(corpus: DataFrame, codebooks: DataFrame, m: Int, subDim: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding"): Double =
    encode(corpus, codebooks, m, subDim, corpusId, corpusVec)
      .select(col(corpusId), posexplode(col("codes")).as(Seq("j", "code")))
      .join(corpus.select(col(corpusId), toDoubleArray(col(corpusVec)).as("_v")), corpusId)
      .withColumn("sub_v", slice(col("_v"), col("j") * subDim + 1, lit(subDim)))
      .join(broadcast(codebooks.withColumnRenamed("code_id", "code")), Seq("j", "code"))
      .groupBy(col(corpusId))
      .agg(sum(d2(col("sub_v"), col("cb_v"))).as("_e"))
      .agg(avg(col("_e"))).head().getDouble(0)

  /** Encode every corpus vector as `m` codebook ids (subspace order):
    * (corpusId, codes array<long>). One broadcast join + two partial
    * aggregations — the corpus never shuffles wider than one row per
    * (vector, subspace).
    */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int, subDim: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame =
    corpus.select(col(corpusId), toDoubleArray(col(corpusVec)).as("_v"))
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("sub_v", slice(col("_v"), col("j") * subDim + 1, lit(subDim)))
      .join(broadcast(codebooks), "j")
      .withColumn("_d2", d2(col("sub_v"), col("cb_v")))
      // nearest entry per (vector, subspace); ties to the smallest id
      .groupBy(col(corpusId), col("j"))
      .agg(min_by(col("code_id"), struct(col("_d2"), col("code_id"))).as("code"))
      .groupBy(col(corpusId))
      .agg(array_sort(collect_list(struct(col("j"), col("code")))).as("_jc"))
      .select(col(corpusId), col("_jc.code").as("codes"))

  /** ADC top-k of each query over a PQ-encoded corpus (ascending
    * approximate distance, ties to the smallest corpus id).
    */
  /** Per-query distance table to every codebook entry: (queryId, j,
    * code, _d2) — |q|·m·|codebook| rows, broadcast-sized by
    * construction.
    */
  private def distanceTable(queries: DataFrame, codebooks: DataFrame,
      m: Int, subDim: Int, queryId: String, queryVec: String): DataFrame =
    queries
      .select(col(queryId), toDoubleArray(col(queryVec)).as("_qv"))
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("q_sub", slice(col("_qv"), col("j") * subDim + 1, lit(subDim)))
      .join(broadcast(codebooks), "j")
      .select(col(queryId), col("j"), col("code_id").as("code"),
        d2(col("q_sub"), col("cb_v")).as("_d2"))

  def adcTopK(queries: DataFrame, encoded: DataFrame, codebooks: DataFrame,
      k: Int, m: Int, subDim: Int,
      queryId: String = "query_id", corpusId: String = "vec_id",
      queryVec: String = "qv"): DataFrame = {
    val dtable = distanceTable(queries, codebooks, m, subDim, queryId, queryVec)
    val scored = encoded
      .select(col(corpusId), posexplode(col("codes")).as(Seq("j", "code")))
      .join(broadcast(dtable), Seq("j", "code"))
      .filter(col(queryId) =!= col(corpusId))
      // subspace-ORDERED summation: collect (j, d2), sort, fold left to
      // right — bit-replayable externally, unlike an unordered SUM
      .groupBy(col(queryId), col(corpusId))
      .agg(array_sort(collect_list(struct(col("j"), col("_d2")))).as("_jd"))
      .withColumn("adc_d2",
        aggregate(col("_jd._d2"), lit(0.0), (acc, x) => acc + x))
    TopK.perGroup(scored.drop("_jd"),
        partitionBy = Seq(col(queryId)),
        orderBy = Seq(col("adc_d2"), col(corpusId)),
        k = k)
      .select(col(queryId), col(corpusId), col("adc_d2"), col("rk"))
  }

  /** IVF-PQ index build — the canonical billion-vector index shape (an
    * inverted file whose lists hold PQ codes, not vectors): ONE corpus
    * scan assigns each vector to its nearest IVF centroid
    * ([[SimilaritySearch.buildIvfIndex]]) and PQ-encodes it in the same
    * pass. The index row is (corpusId, cent_id, codes) — ids and ~m
    * bytes of codes, no floats — written `partitionBy("cent_id")` like
    * the plain IVF index.
    *
    * @param byResidual encode v − centroid instead of v (the FAISS
    *   default): residuals have far smaller spread than raw vectors, so
    *   the same codebook budget reconstructs them tighter. The probe
    *   side must use the same flag (its distance tables are then built
    *   per probed (query, centroid) pair against q − centroid).
    *   Residual subtraction is element-wise — bit-identical across
    *   engines, so both variants stay oracle-replayable.
    */
  def buildIvfPqIndex(centroids: DataFrame, codebooks: DataFrame, corpus: DataFrame,
      m: Int, subDim: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      byResidual: Boolean = false): DataFrame =
    SimilaritySearch.buildIvfIndex(centroids, corpus, corpusId, corpusVec)
      .transform { assigned =>
        if (!byResidual) assigned
        else assigned
          .join(broadcast(centroids.select(col("cent_id"), col("cent_v"))), "cent_id")
          .withColumn("_cv", zip_with(col("_cv"), col("cent_v"), (a, b) => a - b))
          .drop("cent_v")
      }
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("sub_v", slice(col("_cv"), col("j") * subDim + 1, lit(subDim)))
      .join(broadcast(codebooks), "j")
      .withColumn("_d2", d2(col("sub_v"), col("cb_v")))
      .groupBy(col(corpusId), col("cent_id"), col("j"))
      .agg(min_by(col("code_id"), struct(col("_d2"), col("code_id"))).as("code"))
      .groupBy(col(corpusId), col("cent_id"))
      .agg(array_sort(collect_list(struct(col("j"), col("code")))).as("_jc"))
      .select(col(corpusId), col("cent_id"), col("_jc.code").as("codes"))

  /** IVF-PQ probe: centroid probing restricts the ADC scan to the
    * probed inverted lists — per batch, |q|·m·|codebook| table build +
    * a broadcast probe into ~nProbe/nCentroids of the code index. The
    * 100 TB serving path: the index carries no vectors, so the scan
    * reads ~m bytes per candidate.
    */
  def probeIvfPq(index: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int, m: Int, subDim: Int,
      queryId: String = "query_id", corpusId: String = "vec_id",
      queryVec: String = "qv", byResidual: Boolean = false): DataFrame = {
    val probes = SimilaritySearch
      .centroidProbes(queries, centroids, nProbe, queryId, queryVec)
    val (joined, dtableKey) =
      if (!byResidual) {
        val dtable = distanceTable(queries, codebooks, m, subDim, queryId, queryVec)
        (broadcast(dtable), Seq("j", "code", queryId))
      } else {
        // residual mode: one distance table per probed (query, centroid)
        // pair — |q|·nProbe·m·|codebook| rows, still broadcast-sized
        val dtable = probes
          .join(broadcast(centroids.select(col("cent_id"), col("cent_v"))), "cent_id")
          .withColumn("_rv", zip_with(col("_qv"), col("cent_v"), (a, b) => a - b))
          .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
          .withColumn("q_sub", slice(col("_rv"), col("j") * subDim + 1, lit(subDim)))
          .join(broadcast(codebooks), "j")
          .select(col(queryId), col("cent_id"), col("j"),
            col("code_id").as("code"), d2(col("q_sub"), col("cb_v")).as("_d2"))
        (broadcast(dtable), Seq("j", "code", queryId, "cent_id"))
      }
    val scored = index
      .join(broadcast(probes.select(col(queryId), col("cent_id"))), "cent_id")
      .select(col(queryId), col("cent_id"), col(corpusId),
        posexplode(col("codes")).as(Seq("j", "code")))
      .join(joined, dtableKey)
      .filter(col(queryId) =!= col(corpusId))
      .groupBy(col(queryId), col(corpusId))
      .agg(array_sort(collect_list(struct(col("j"), col("_d2")))).as("_jd"))
      .withColumn("adc_d2",
        aggregate(col("_jd._d2"), lit(0.0), (acc, x) => acc + x))
    TopK.perGroup(scored.drop("_jd"),
        partitionBy = Seq(col(queryId)),
        orderBy = Seq(col("adc_d2"), col(corpusId)),
        k = k)
      .select(col(queryId), col(corpusId), col("adc_d2"), col("rk"))
  }
}
