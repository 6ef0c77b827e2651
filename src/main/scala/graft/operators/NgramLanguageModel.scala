package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Count-based bigram language model for corpus quality filtering — the
  * KenLM-style "perplexity filter" of LLM data pipelines (CCNet et al.):
  * train token-bigram counts on the corpus itself, then score every
  * document by its average bigram log-likelihood under add-α smoothing.
  * Low-scoring documents are gibberish / boilerplate relative to the
  * corpus distribution; high-scoring ones are typical text.
  *
  * 100 TB design:
  *  - model fit is ONE map-side-combined shuffle on the bigram key
  *    (`groupBy(w1, w2).count`) — the classic distributed n-gram count;
  *    context totals derive from the bigram table (a second, far smaller
  *    aggregation), never from a rescan of the corpus.
  *  - scoring joins each document's bigram occurrences to the model on
  *    (w1, w2). The Zipf head makes that key skewed; AQE skew-join
  *    handles it at runtime (enabled in [[graft.Sessions]]), and the
  *    scalar (vocabulary size) rides a broadcast, not a shuffle.
  *  - the bigram projection is persisted because it feeds both the model
  *    fit and the scoring join — without it the tokenize+explode pipeline
  *    runs twice over the corpus (C3).
  *  - per-document sums fold over lists sorted by (w1, w2) so the float
  *    result is reproducible bit-for-bit across engines and re-runs
  *    (same ordered-fold discipline as the BM25 scorer).
  */
object NgramLanguageModel {

  /** (doc_id, w1, w2) — one row per bigram OCCURRENCE. The sequence is
    * guarded (`size < 2` → empty) because Spark's `sequence(1, 0)`
    * generates a DESCENDING range, not an empty one.
    */
  def bigramOccurrences(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    // fan out before tokenize + bigram explosion (guide §2.5)
    ScanFanout.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"),
        explode(when(size(col("_toks")) < 2, array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(transform(sequence(lit(1), size(col("_toks")) - 1),
            i => struct(element_at(col("_toks"), i).as("w1"),
              element_at(col("_toks"), i + 1).as("w2"))))).as("_bg"))
      .select(col("doc_id"), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))

  /** Per-document average bigram log-likelihood:
    * `avg over bigrams of ln((c(w1,w2) + α) / (c(w1·) + α·V))`, V the
    * corpus unigram vocabulary size. Documents with fewer than two
    * tokens have no bigrams and are absent from the result.
    *
    * Output: (doc_id, n_bigrams int, avg_ll double rounded 4).
    */
  def scoreDocs(docs: DataFrame, alpha: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // persist: feeds the model fit (c2 → c1) AND the scoring join
    val bg = bigramOccurrences(docs, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vsz = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .agg(count_distinct(col("token")).as("vsz"))
    val parts = bg
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vsz))
      .select(col("doc_id"), col("w1"), col("w2"),
        log((col("c2") + lit(alpha)) / (col("c1") + lit(alpha) * col("vsz"))).as("part"))
    parts
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("w1"), col("w2"), col("part")))).as("_p"),
        count(lit(1)).cast("int").as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(aggregate(col("_p.part"), lit(0.0), (acc, x) => acc + x) / col("n_bigrams"), 4)
          .as("avg_ll"))
  }
}
