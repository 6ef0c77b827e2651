package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring duplication washing (the RefinedWeb/Gopher recipe):
  * slide a word n-gram window over every document, find the grams
  * shared by ≥ `minDocs` distinct documents, and score each document by
  * the fraction of its gram positions that land on such shared grams.
  * High-fraction documents are templated/boilerplate/near-copy content
  * that MinHash-style whole-document dedup misses (it needs global
  * similarity; this catches a copied paragraph inside an otherwise
  * unique page) — the standard wash before LLM pretraining.
  *
  * Scale shape (100 TB): the gram stream is corpus-sized (one row per
  * token position) but never materialized wide — it flows into ONE
  * map-side-combined groupBy(gram) for the shared-gram table and one
  * left-semi join back (shuffle keyed on the gram hash both times, so
  * AQE reuses the exchange pattern). No pairwise document comparison
  * anywhere: cost is O(total tokens), not O(docs²).
  */
object DupNgrams {

  /** Word n-grams shared by at least `minDocs` distinct docs:
    * (gram, n_docs long).
    */
  def commonGrams(docs: DataFrame, n: Int = 8, minDocs: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    grams(docs, n, idCol, textCol)
      .groupBy(col("gram")).agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Per-document duplication score against the shared-gram table:
    * (idCol, n_grams long — gram positions in the doc, n_dup long —
    * positions on shared grams, dup_frac double r6, 0 for docs shorter
    * than n tokens) ordered by id.
    */
  def washFraction(docs: DataFrame, n: Int = 8, minDocs: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val g = grams(docs, n, idCol, textCol)
    val common = commonGrams(docs, n, minDocs, idCol, textCol).select(col("gram"))
    val total = g.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val dup = g.join(common, Seq("gram"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_dup"))
    docs.select(col(idCol))
      .join(total, Seq(idCol), "left")
      .join(dup, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac",
        when(col("n_grams") > 0,
          round(col("n_dup").cast("double") / col("n_grams").cast("double"), 6))
          .otherwise(lit(0.0)))
      .orderBy(col(idCol))
  }

  /** One row per n-gram POSITION (docs shorter than n yield none). */
  private def grams(docs: DataFrame, n: Int,
      idCol: String, textCol: String): DataFrame =
    // fan out before tokenize + n-gram explosion (guide §2.5)
    ScanFanout.byKey(docs, col(idCol))
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(ts) - $n), i -> array_join(slice(ts, i + 1, $n), ' '))"))
        .as("gram"))
}
