package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase retrieval over a positional token index: documents
  * where the query words occur ADJACENTLY in order — the positional
  * posting-list intersection behind every "quoted search", which BM25
  * bag-of-words scoring (X45) cannot answer.
  *
  * Scale shape: the token table is (doc, word, pos); each query word
  * selects its own posting list (a tiny filtered slice), lists join on
  * (doc, pos − offset) — pure equi-joins whose sizes are posting-list
  * sizes, not corpus size. At 100 TB the token table is the
  * materialized inverted index, bucketed by word, and each phrase
  * query touches |phrase| postings only. Top-k by match count is a
  * TakeOrdered, not a global sort.
  */
object PhraseSearch {

  /** Tokenize: one row per (doc_id, w, pos), 0-based word positions. */
  def tokens(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))

  /** Documents containing `phrase` (≥ 2 words) as adjacent tokens:
    * (doc_id, n_matches) for the top `k` by (matches desc, doc_id).
    */
  def search(docs: DataFrame, phrase: Seq[String], k: Int = 20): DataFrame = {
    require(phrase.size >= 2, "single-word lookup is a plain filter")
    val toks = tokens(docs)
    def posting(word: String, offset: Int): DataFrame =
      toks.filter(col("w") === word)
        .select(col("doc_id"), (col("pos") - offset).as("p0"))
    val matches = phrase.zipWithIndex
      .map { case (w, i) => posting(w, i) }
      .reduce((a, b) => a.join(b, Seq("doc_id", "p0")))
    matches.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("n_matches").desc, col("doc_id"))
      .limit(k)
  }
}
