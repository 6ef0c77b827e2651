package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed micro-batching — the NMT/pretraining trick that cuts
  * padding waste: sequences are grouped into length buckets and batched
  * WITHIN a bucket, so each batch pads to the max of near-equal lengths
  * instead of the corpus max. Deterministic and replayable (bucket from
  * fixed edges, batch from a row_number over id order — no rand), so an
  * external engine reproduces the exact assignment.
  *
  * Scale shape: like [[CorpusPacking]], batching is SHARD-PARALLEL —
  * a single global row_number would serialize the corpus through one
  * partition, so ids are deterministically sharded and each (shard,
  * bucket) numbers independently; with uniform ids each window
  * partition carries corpus/(nShards × buckets) rows and nShards scales
  * with the cluster. One shuffle (the window), one map-side-combined
  * aggregate for the per-batch stats.
  */
object LengthBatching {

  /** Bucket index = number of edges <= len (edges ascending): len < e0
    * → 0, e0 <= len < e1 → 1, ... — same arithmetic in SQL.
    */
  def bucketOf(len: Column, edges: Seq[Long]): Column = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      s"bucket edges must be ascending and distinct: $edges")
    edges.map(e => when(len >= e, 1).otherwise(0)).reduce(_ + _)
  }

  /** One row per doc: (idCol, len long, shard long, bucket int, batch
    * long, pos_in_batch long).
    */
  def assign(docs: DataFrame, idCol: String, lenCol: String,
      edges: Seq[Long], batchSize: Int, nShards: Int = 64): DataFrame = {
    require(batchSize > 0 && nShards > 0, "batchSize and nShards must be positive")
    val w = Window.partitionBy(col("shard"), col("bucket")).orderBy(col(idCol))
    docs
      .select(col(idCol), col(lenCol).cast("long").as("len"),
        pmod(col(idCol).cast("long"), lit(nShards.toLong)).as("shard"))
      .withColumn("bucket", bucketOf(col("len"), edges))
      .withColumn("__rn", row_number().over(w))
      // explicit floor: Spark's long cast truncates the double division
      // but DuckDB's CAST ROUNDS — both sides must write floor()
      .withColumn("batch", floor((col("__rn") - 1) / batchSize).cast("long"))
      .withColumn("pos_in_batch", ((col("__rn") - 1) % batchSize).cast("long"))
      .drop("__rn")
  }

  /** Per-batch padding stats: (shard, bucket, batch, n_seqs, max_len,
    * sum_len, padded_tokens = n*max − Σlen) — the number a trainer
    * multiplies by FLOPs/token to size the win over naive batching.
    */
  def paddingStats(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard"), col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_seqs"), max(col("len")).as("max_len"),
        sum(col("len")).as("sum_len"))
      .withColumn("padded_tokens",
        col("n_seqs") * col("max_len") - col("sum_len"))
      .orderBy(col("shard"), col("bucket"), col("batch"))
}
