package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary-growth audit (Heaps'-law curve): how many NEW token
  * types each slice of the corpus contributes, against its token
  * volume — the corpus-composition diagnostic behind "is more data
  * still adding vocabulary, or just repetition?" (healthy corpora grow
  * ≈ n^β, β≈0.5; a flat tail means the new slice is near-duplicate of
  * what came before; a spike flags a domain shift or an encoding bug).
  *
  * A token type is attributed to the FIRST document (smallest id)
  * containing it, so the per-bucket new-type counts are an exact
  * function of the corpus — no sampling — and replay on any engine.
  *
  * Scale shape (100 TB): explode → per-type min(doc_id) is one
  * map-side-combined aggregate (types, not tokens, survive the
  * shuffle); bucket rollups are a second tiny aggregate; the only
  * window is the cumulative sum over the ≤ #buckets frame —
  * metadata-scale, like [[CompactionPlan]]'s sweep.
  */
object VocabGrowth {

  /** Per-bucket growth curve over documents bucketed by
    * `idCol div bucketWidth`: (bucket, n_docs, n_tokens, n_new_types,
    * vocab_size — cumulative distinct types through this bucket),
    * ordered by bucket.
    *
    * @param tokens an array<string> column expression (pre-tokenized)
    */
  def curve(docs: DataFrame, idCol: String, tokens: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"curve: bucketWidth must be positive, got $bucketWidth")
    val base = docs.select(col(idCol).cast("long").as("_id"), tokens.as("_toks"))
    val perDoc = base.select(col("_id"),
      expr(s"_id div ${bucketWidth}L").as("bucket"), size(col("_toks")).as("_ntok"))
    val docStats = perDoc.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_ntok")).cast("long").as("n_tokens"))
    // first-occurrence attribution: one aggregate over exploded types
    val firstDoc = base
      .select(col("_id"), explode(array_distinct(col("_toks"))).as("_tok"))
      .groupBy(col("_tok")).agg(min(col("_id")).as("_first"))
    val newTypes = firstDoc
      .groupBy(expr(s"_first div ${bucketWidth}L").as("bucket"))
      .agg(count(lit(1)).as("n_new_types"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docStats.join(newTypes, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_new_types"))
      .withColumn("vocab_size", sum(col("n_new_types")).over(wCum))
      .orderBy(col("bucket"))
  }
}
