package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PMI collocation mining: adjacent token pairs whose co-occurrence
  * beats chance, `pmi = ln(c_ab · N_uni² / (N_bi · c_a · c_b))` — the
  * classic corpus-analysis extractor for multi-word expressions
  * ("hong kong", "prime minister") that tokenizer vocab builds and
  * phrase-aware dedup both consume. Everything inside the `ln` is an
  * exact integer product of counts, so the scores hash-compare across
  * engines; the single float op happens once per surviving pair.
  *
  * Scale shape (100 TB): bigram and unigram counts are each ONE
  * map-side-combined shuffle over the token stream (the bigram
  * explode is persisted and feeds both, C3); the min-support filter
  * cuts the pair table BEFORE the two unigram joins, and those joins
  * broadcast only if the filtered side is small — at corpus scale they
  * shuffle on w1/w2, never on the raw stream. Top-k is a
  * TakeOrderedAndProject, never a global sort.
  */
object Collocations {

  /** Top-`k` collocations with support ≥ `minCount`.
    * Output: (rk int, w1, w2, c_ab long, pmi double r6), pmi-desc,
    * ties broken on (w1, w2).
    */
  def topPmi(docs: DataFrame, k: Int = 20, minCount: Long = 5L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (out, bg, uni) = topPmiFrame(docs, k, minCount, idCol, textCol)
    // eager localCheckpoint, not persist+count: unpersisting bg/uni
    // below would invalidate a dependent CacheManager entry (data
    // dropped, lazily re-cached) and recompute the whole scan on the
    // caller's first action; checkpoint blocks are immune
    val pinned = out.localCheckpoint(true)
    bg.unpersist(); uni.unpersist()
    pinned
  }

  /** The UNMATERIALIZED plan behind [[topPmi]], plus the two cached
    * count tables it leaves pinned — exposed so plan-shape tests can
    * assert the TakeOrderedAndProject/broadcast structure that the
    * public method's checkpoint hides behind an RDD scan. Callers other
    * than tests want [[topPmi]].
    */
  private[graft] def topPmiFrame(docs: DataFrame, k: Int = 20, minCount: Long = 5L,
      idCol: String = "doc_id", textCol: String = "text"): (DataFrame, DataFrame, DataFrame) = {
    val bg = NgramLanguageModel.bigramOccurrences(docs, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uni = docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nUni = uni.agg(sum(col("c")).as("n_uni"))
    val nBi = bg.agg(count(lit(1)).as("n_bi"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
    val scored = pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      // every factor is an exact long; ln of the exact rational
      .withColumn("pmi", round(
        log(col("c_ab").cast("double") * col("n_uni").cast("double") * col("n_uni").cast("double")
          / (col("n_bi").cast("double") * col("c_a").cast("double") * col("c_b").cast("double"))), 6))
    val out = scored
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc).limit(k)
      .withColumn("rk", row_number().over(w))
      .select(col("rk"), col("w1"), col("w2"), col("c_ab"), col("pmi"))
    (out, bg, uni)
  }
}
