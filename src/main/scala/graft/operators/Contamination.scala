package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: for each corpus document, how many
  * of its word n-grams also occur in a benchmark/eval set — the standard
  * decontamination gate a training-data pipeline runs before every
  * pretraining mix (n-gram collision against held-out eval suites).
  *
  * Scale shape for 100 TB: the benchmark side is always tiny relative to
  * the corpus (eval suites are MBs; the corpus is TBs), so its DISTINCT
  * shingle set is broadcast — the corpus streams through one codegen'd
  * explode + broadcast semi-join + groupBy with map-side combine, no
  * shuffle of corpus text and no shuffle of the exploded shingle set at
  * all. Only per-doc counter rows (16 bytes) reach the final exchange.
  */
object Contamination {

  /** Per-corpus-document overlap stats against the benchmark n-gram set.
    *
    * @return (doc_id, n_shingles, n_contaminated, contamination) — one
    *         row per corpus doc that has at least one shingle;
    *         `contamination` = n_contaminated / n_shingles over the
    *         DISTINCT shingles of the doc.
    */
  def ngramOverlap(corpus: DataFrame, benchmark: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def shingleRows(df: DataFrame): DataFrame = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"),
        explode(array_distinct(shinglesFromTokens(col("_toks"), n))).as("shingle"))

    val benchShingles = shingleRows(benchmark).select(col("shingle")).distinct()
    val corpusShingles = shingleRows(corpus)
    // left join against the broadcast benchmark set, then conditional
    // count — one pass over the corpus shingles, no second explode
    val hit = corpusShingles
      .join(broadcast(benchShingles.withColumn("_hit", lit(1))), Seq("shingle"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0))).as("n_contaminated"))
    hit.select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
      (col("n_contaminated").cast("double") / col("n_shingles")).as("contamination"))
  }
}
