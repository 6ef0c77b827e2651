package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus novelty curve: per arrival batch, what fraction of the
  * batch's distinct n-grams has never been seen before — the
  * saturation signal that tells a crawl/ingest pipeline when a source
  * stops contributing new content (novelty → 0 ⇒ stop paying for it),
  * complementing the cross-batch KL drift (X47) which measures shift,
  * not newness.
  *
  * Scale shape: tokens explode once; first-sight is ONE
  * map-side-combined min-aggregate per distinct n-gram (never a
  * window over occurrences); per-batch stats are two joins of
  * batch-cardinality aggregates. N-grams (not words) keep the
  * vocabulary unsaturated, which is what makes the curve readable.
  */
object NoveltyRate {

  /** (batch, n_occurrences, n_distinct, n_new, novelty) per batch:
    * `batchCol` integral arrival batch, text split on single spaces
    * into word `n`-grams. `novelty` = n_new / n_distinct (6 dp).
    */
  def perBatch(docs: DataFrame, batchCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val words = docs.select(col(batchCol).cast("long").as("b"),
      split(col(textCol), " ").as("ws"))
      // texts shorter than n words emit nothing — and must be dropped
      // BEFORE sequence(0, size-n) goes negative (descending sequence)
      .filter(size(col("ws")) >= n)
    val grams = words.select(col("b"),
      explode(expr(s"transform(sequence(0, size(ws) - $n), i -> " +
        s"array_join(slice(ws, i + 1, $n), ' '))")).as("g"))
    val perGram = grams.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
    val firstSeen = perGram.groupBy(col("g")).agg(min(col("b")).as("fb"))
    perGram.join(firstSeen, Seq("g"))
      .groupBy(col("b").as("batch"))
      .agg(sum(col("c")).as("n_occurrences"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("fb") === col("b"), 1L).otherwise(0L)).as("n_new"))
      .withColumn("novelty",
        round(col("n_new").cast("double") / col("n_distinct"), 6))
  }
}
