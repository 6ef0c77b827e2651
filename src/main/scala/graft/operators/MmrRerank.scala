package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998): greedily select k items from a per-query shortlist, each step
  * maximizing `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` — relevance
  * traded against redundancy. The standard diversity pass after
  * retrieval, and the selection rule behind diverse training-data
  * subsampling.
  *
  * The greedy recurrence is inherently sequential in k, so the k steps
  * are unrolled as k dataframe stages (the same discipline as the
  * Hilbert-curve unroll): every step is relational — an anti-join to
  * drop selected ids, one bounded aggregation for the redundancy term,
  * and a window-limit argmax — which keeps the whole thing replayable
  * row-for-row by an external SQL oracle.
  *
  * Scale shape (100 TB): everything downstream of the shortlist is
  * bounded by nQueries × topN — the corpus-sized work happened in the
  * retrieval stage that produced `cands`. The shortlist is persisted so
  * the k unrolled stages don't re-run the corpus scan that feeds it;
  * pairwise sims are computed once (topN² per query, not corpus²).
  */
object MmrRerank {

  /** @param cands shortlist: (query_id, idCol, rel, vecCol) — rel is the
    *              retrieval score, vecCol a double-array embedding
    * @return (query_id, idCol, score, step) — one row per greedy pick,
    *         step 1..k, score = the MMR objective at selection time
    *         (empty-set redundancy = 0, so step 1's score is λ·rel)
    */
  def rerank(cands: DataFrame, k: Int, lambda: Double = 0.7,
      idCol: String = "doc_id", vecCol: String = "cv"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    // one corpus-independent table feeds all k stages: persist it so the
    // unrolled lineage doesn't re-run the retrieval scan per stage (the
    // harness's per-query cache clear releases it)
    val base = cands
      .select(col("query_id"), col(idCol), col("rel"),
        toDoubleArray(col(vecCol)).as("_v"))
      .withColumn("_n", norm(col("_v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val x = base.select(col("query_id"), col(idCol).as("a"), col("_v").as("_va"), col("_n").as("_na"))
    val y = base.select(col("query_id"), col(idCol).as("b"), col("_v").as("_vb"), col("_n").as("_nb"))
    val pairs = x.join(y, Seq("query_id")).filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        when(col("_na") * col("_nb") === 0.0, lit(0.0))
          .otherwise(dot(col("_va"), col("_vb")) / (col("_na") * col("_nb"))).as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rels = base.select(col("query_id"), col(idCol), col("rel"))

    // Each greedy pick is ≤ nQueries rows; persist it (LAZILY) so stage
    // s's plan reads k−1 cached micro-tables instead of replaying
    // stages 1..s−1 — without the persist the `selected` subtree is
    // referenced ~3× per stage and lineage grows exponentially in k.
    // The persist REGISTRATION alone breaks the blowup: block-store
    // dedup computes each cached frame once even when the first (and
    // only) action evaluates all k stages in one job. The previous
    // eager count() per pick spent one whole job per stage on frames of
    // a few dozen rows — 6+ driver actions of pure scheduling overhead
    // at sf0.1 (over half the query's wall-clock).
    def pin(df: DataFrame): DataFrame =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var selected = pin(TopK.perGroup(rels,
        partitionBy = Seq(col("query_id")),
        orderBy = Seq(col("rel").desc, col(idCol)),
        k = 1)
      .select(col("query_id"), col(idCol),
        (lit(lambda) * col("rel")).as("score"), lit(1).as("step")))
    for (s <- 2 to k) {
      val selIds = selected.select(col("query_id"), col(idCol))
      // redundancy term: max sim of each unselected candidate to the
      // selected set — bounded by topN rows per query on both sides
      val msim = pairs
        .join(selIds.withColumnRenamed(idCol, "b"), Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a")).agg(max(col("sim")).as("_msim"))
      val scored = rels
        .join(selIds, Seq("query_id", idCol), "left_anti")
        .join(msim.withColumnRenamed("query_id", "_qm"),
          col(idCol) === col("a") && col("query_id") === col("_qm"))
        .select(col("query_id"), col(idCol),
          (lit(lambda) * col("rel") - lit(1.0 - lambda) * col("_msim")).as("score"))
      val pick = pin(TopK.perGroup(scored,
          partitionBy = Seq(col("query_id")),
          orderBy = Seq(col("score").desc, col(idCol)),
          k = 1)
        .select(col("query_id"), col(idCol), col("score"), lit(s).as("step")))
      selected = selected.unionByName(pick)
    }
    selected
  }
}
