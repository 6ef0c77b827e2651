package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-scale BPE merge-pair statistics — the inner count of a
  * byte-pair-encoding tokenizer fit: the most frequent ADJACENT SYMBOL
  * PAIR inside words is the next merge rule. A full BPE fit is a driver
  * loop (re-count with the merged vocabulary, ~vocab-size iterations);
  * each iteration IS this operator, so the distributed cost profile is
  * exactly one map-side-combined count per merge.
  *
  * 100 TB design: explode(word → adjacent char pairs) feeds a count
  * aggregation on a tiny key domain (|alphabet|² initially) — partial
  * aggregation collapses it executor-side; the global top-k is a
  * TakeOrderedAndProject, never a full sort.
  */
object BpeMerges {

  /** Top-`k` adjacent-character pairs within words, ranked by frequency
    * (count desc, pair asc). Output: (rk int, pair string, cnt long).
    */
  def topMerges(docs: DataFrame, k: Int = 20, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cnt").desc, col("pair"))))
      .select(col("rk"), col("pair"), col("cnt"))
}
