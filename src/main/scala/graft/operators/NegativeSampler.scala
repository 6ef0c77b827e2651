package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for contrastive / retrieval training
  * sets: for every query document, pick `k` corpus documents that are
  * NOT content-matches, chosen by a replayable integer hash — so the
  * training set is reproducible run-over-run and engine-over-engine
  * (the same Knuth mod-1e9+7 family as [[MixtureSampler]]).
  *
  * 100 TB design: the corpus is first cut to a hash slice (a codegen'd
  * filter at the scan — no shuffle), so the query×candidate fan-out is
  * |Q|·|corpus|/sliceMod instead of |Q|·|corpus|; the query set rides a
  * broadcast. Ranking inside each query group is a WindowGroupLimit
  * (top-k per group), never a global sort. Choose `sliceMod` so the
  * sliced fan-out fits the cluster; the slice stays uniform because the
  * hash is on the candidate id, independent of the query.
  */
object NegativeSampler {

  /** `k` negatives per query: candidates from the `1/sliceMod` hash
    * slice of `corpus`, excluding exact content matches of the query,
    * ranked by hash(query_id, cand_id).
    * Output: (q_id, neg_id, rk int).
    */
  def negatives(queries: DataFrame, corpus: DataFrame, k: Int = 5,
      sliceMod: Int = 5, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), md5(col(textCol).cast("binary")).as("q_md5"))
    // mod BEFORE multiplying, like every Knuth hash in the repo: the
    // reduced value × 2654435761 stays under Long.MaxValue for any id,
    // where (id + 42) × 2654435761 overflows (ANSI throw) past ~3.5e9
    val cand = corpus
      .select(col(idCol).as("neg_id"), md5(col(textCol).cast("binary")).as("c_md5"))
      .filter((col("neg_id") + 42) % 1000000007L * 2654435761L % 1000000007L % sliceMod === 0)
    val ranked = cand.join(broadcast(q), col("c_md5") =!= col("q_md5"))
      .select(col("q_id"), col("neg_id"),
        ((col("q_id") % 1000000007L * 31 + col("neg_id") % 1000000007L + 42) % 1000000007L
          * 2654435761L % 1000000007L).as("h"))
    // perGroup's rk IS the deterministic per-query rank — no second window
    TopK.perGroup(ranked, partitionBy = Seq(col("q_id")),
        orderBy = Seq(col("h"), col("neg_id")), k = k)
      .select(col("q_id"), col("neg_id"), col("rk"))
  }
}
