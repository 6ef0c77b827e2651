package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum interleaving: assign every document a deterministic
  * training position such that quality strata alternate — batch b sees
  * one document from each quantile bucket before any bucket repeats.
  * The standard data-ordering step between curation and training
  * (pure quality-descending order overfits early batches to one
  * stratum; random order loses the curriculum), made replayable: the
  * same corpus always yields the same order.
  *
  * Scale shape (100 TB): bucket boundaries come from ONE exact
  * percentile aggregation (driver-held, folded in as literals — the
  * [[QuantileBinning]] path, never a global ntile window); positions
  * are row_numbers PARTITIONED by bucket (each window sorts one
  * stratum, not the corpus); and the interleave key is pure arithmetic
  * `(pos−1)·nBuckets + bucket` — a total order WITHOUT any global
  * sort. Consumers range-partition on ikey to write training shards.
  */
object CurriculumOrder {

  /** @param scoreCol quality score (higher = better); ties broken by id
    * @return (idCol, bucket int 1..nBuckets — 1 is the TOP stratum,
    *   pos long — 1-based rank inside the bucket, ikey long — global
    *   interleaved position key) ordered by ikey.
    */
  def interleave(docs: DataFrame, nBuckets: Int = 4,
      idCol: String = "doc_id", scoreCol: String = "score"): DataFrame = {
    require(nBuckets >= 2, s"nBuckets=$nBuckets must be >= 2")
    val cuts = QuantileBinning.bins(docs, scoreCol, nBuckets)
    // bucket 1 = best: count of boundaries at-or-above the score + 1
    // (score > cut falls in the richer bucket, ties go low — the exact
    // complement of assignBin so both engines agree on boundary rows)
    val bucket = cuts.map(b => when(col(scoreCol) > b, 0).otherwise(1))
      .reduce(_ + _) + 1
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    docs.select(col(idCol), col(scoreCol))
      .withColumn("bucket", bucket)
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("ikey", (col("pos") - 1) * nBuckets + col("bucket"))
      .select(col(idCol), col("bucket"), col("pos"), col("ikey"))
      .orderBy(col("ikey"), col(idCol))
  }
}
