package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a lexical (BM25) ranking and a dense (embedding
  * cosine) ranking of the same corpus with reciprocal-rank fusion
  * (Cormack et al., SIGIR 2009): `score(d) = Σ_r 1/(kRrf + rank_r(d))`.
  *
  * The reference pipeline retrieves by a single signal; production LLM
  * data pipelines retrieve by both and fuse, because the two signals fail
  * independently (lexical misses paraphrase, dense misses rare tokens).
  * RRF needs only the RANKS, which makes it exactly replayable by an
  * external oracle even though the underlying scores are floats.
  *
  * Scale shape (100 TB):
  *  - the query set is tiny and broadcast on both legs; the corpus
  *    streams once per leg and each leg keeps ≤ topN rows per query
  *    before any wide shuffle (window-group-limit on the dense leg, a
  *    term-restricted inverted pairing on the lexical leg — only rows
  *    containing a query term survive the semi join, df-bounded);
  *  - fusion joins two (nQueries × topN)-row tables — negligible;
  *  - the dense leg here is the exact brute-force baseline; at corpus
  *    scale swap in [[SimilaritySearch.ivfTopK]] (same output contract:
  *    query_id, id, rk) without touching the fusion.
  */
object HybridRetrieval {

  /** Per-query BM25 (k1 = 1.2, b = 0.75) of every document containing at
    * least one of the query's terms.
    *
    * @param docs       corpus with `idCol` and a whitespace-tokenizable
    *                   `textCol`
    * @param queryTerms tiny (query_id, token) table — one row per query
    *                   term; broadcast to the corpus
    * @param topN       rank cutoff per query
    * @return (query_id, idCol, bm25, lex_rk) with lex_rk ≤ topN; a
    *         document never matches its own query row (doc_id ==
    *         query_id is excluded so self-retrieval can't pin rank 1)
    */
  def bm25PerQuery(docs: DataFrame, queryTerms: DataFrame, topN: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
    // one shuffle by doc id for lengths; the scalar stats row broadcasts
    val dl = tok.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).as("n"))
    // inverted pairing: only rows whose token is some query's term
    // survive the broadcast semi join — the term list bounds df
    val terms = queryTerms.select(col("token")).distinct()
    val tf = tok.join(broadcast(terms), "token")
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val parts = tf
      .join(broadcast(queryTerms), "token")
      .join(dl, idCol).join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol), col("token"),
        (log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1)
          * (col("tf") * 2.2)
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .as("part"))
    // ordered fold per (query, doc) so the float sum replays bit-exact
    // in any engine (see oracle discipline in SparseSimilarity)
    val scored = parts
      .groupBy(col("query_id"), col(idCol))
      .agg(array_sort(collect_list(struct(col("token"), col("part")))).as("_tp"))
      .select(col("query_id"), col(idCol),
        aggregate(col("_tp.part"), lit(0.0), (acc, x) => acc + x).as("bm25"))
    TopK.perGroup(scored,
        partitionBy = Seq(col("query_id")),
        orderBy = Seq(col("bm25").desc, col(idCol)),
        k = topN)
      .select(col("query_id"), col(idCol), col("bm25"), col("rk").as("lex_rk"))
  }

  /** Reciprocal-rank fusion of two per-query rankings of the same id
    * space. Inputs carry (query_id, idCol, rankCol); a document absent
    * from a leg contributes 0 from that leg. Output:
    * (query_id, idCol, rrf, lex_rk, dense_rk, rk) with rk ≤ k.
    */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int, kRrf: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    val l = lex.select(col("query_id"), col(idCol), col("lex_rk"))
    val d = dense.select(col("query_id"), col(idCol), col("dense_rk"))
    val fused = l.join(d, Seq("query_id", idCol), "full_outer")
      .select(col("query_id"), col(idCol), col("lex_rk"), col("dense_rk"),
        (coalesce(lit(1.0) / (lit(kRrf) + col("lex_rk")), lit(0.0))
          + coalesce(lit(1.0) / (lit(kRrf) + col("dense_rk")), lit(0.0))).as("rrf"))
    fused
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col(idCol))))
      .filter(col("rk") <= k)
  }
}
