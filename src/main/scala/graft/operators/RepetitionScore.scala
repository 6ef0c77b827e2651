package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition-based quality signals (Gopher §A.1.1-style): documents
  * dominated by a few repeated tokens or by duplicated n-grams are
  * low-quality machine text and get filtered before pretraining.
  *
  * Per document:
  *  - `dup_bigram_frac`: 1 − distinct/total word bigrams — duplicated
  *    phrasing. Computed as a pure expression (array size vs distinct
  *    size) — no explode, stays inside whole-stage codegen.
  *  - `top_token_frac`: occurrences of the most frequent token / all
  *    tokens — "aaaa…" degeneracy. Needs per-(doc, token) counts, done as
  *    explode → two map-side-combined aggregations; only (doc_id, token,
  *    count) rows shuffle, never text.
  *  - `repetitive`: either signal over its threshold.
  *
  * ONE scan of the corpus: the per-doc bigram scalars are computed
  * before the token explode, ride it as constant columns, and are
  * recovered with `first()` in the per-doc aggregation — no self-join of
  * two branches over the documents table (which would scan and tokenize
  * the dominant input twice). Both aggregations are map-side combined
  * and partition by doc_id-ish keys with near-uniform cardinality — no
  * skew, no all-pairs, no driver loop; only (doc_id, token, count, two
  * scalars) rows shuffle, never text.
  */
object RepetitionScore {

  def score(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxDupBigramFrac: Double = 0.2, maxTopTokenFrac: Double = 0.2): DataFrame = {
    val bigr = ScanFanout.byKey(docs, col(idCol)) // guide §2.5
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), shinglesFromTokens(col("_toks"), 2).as("_bg"), col("_toks"))
      .select(col("doc_id"),
        col("_toks"),
        size(col("_bg")).as("n_bigrams"),
        when(size(col("_bg")) === 0, lit(0.0))
          .otherwise(lit(1.0) - size(array_distinct(col("_bg"))).cast("double") /
            size(col("_bg")).cast("double")).as("dup_bigram_frac"))

    // plain explode (not outer): zero-token docs carry no repetition
    // signal and are excluded, matching the historical join semantics
    bigr
      .select(col("doc_id"), col("n_bigrams"), col("dup_bigram_frac"),
        explode(col("_toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("_n"),
        first(col("n_bigrams")).as("n_bigrams"),
        first(col("dup_bigram_frac")).as("dup_bigram_frac"))
      .groupBy(col("doc_id"))
      .agg(max(col("_n")).as("_top"), sum(col("_n")).as("n_tokens"),
        first(col("n_bigrams")).as("n_bigrams"),
        first(col("dup_bigram_frac")).as("dup_bigram_frac"))
      .select(col("doc_id"), col("n_bigrams"), col("dup_bigram_frac"),
        col("n_tokens"),
        (col("_top").cast("double") / col("n_tokens")).as("top_token_frac"))
      .withColumn("repetitive",
        col("dup_bigram_frac") > maxDupBigramFrac || col("top_token_frac") > maxTopTokenFrac)
  }
}
