package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental ingestion dedup — the shape a 100 TB corpus actually
  * runs day to day: the accumulated corpus is NOT re-read per batch;
  * its content fingerprints live in a compact STORED INDEX (one
  * fingerprint + canonical doc id per cluster, hive-partitioned by
  * fingerprint prefix), and each new batch probes that.
  *
  * Scale shape: the index is fingerprints-only — probing shuffles
  * 32-hex-char keys, never corpus text; `fp_prefix` partitioning keeps
  * any selective probe (a single shard's re-check, a backfill of one
  * prefix range) to partition-pruned reads (pinned in
  * `IncrementalDedupSpec`), and gives the daily full-batch probe an
  * even 16-way file layout to parallelize over. Appending a deduped
  * batch back into the index is a partition-aligned parquet append —
  * no rewrite of history.
  */
object IncrementalDedup {

  /** First hex char of the fingerprint — 16 even partitions. */
  private def prefixCol = substring(col("fingerprint"), 1, 1).as("fp_prefix")

  /** Build + write the fingerprint index for `docs`: one row per
    * distinct fingerprint (canonical `dup_of` = min id — X174's
    * cheapest policy), hive-partitioned by `fp_prefix`.
    */
  def writeIndex(docs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit =
    docs
      .select(col(idCol), TextFunctions.tokenSetFingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint")).agg(min(col(idCol)).as("dup_of"))
      .select(col("fingerprint"), col("dup_of"), prefixCol)
      .write.mode("overwrite").partitionBy("fp_prefix").parquet(path)

  /** Probe a new batch against the stored index: one row per batch doc
    * whose fingerprint ALREADY EXISTS — (idCol, dup_of, fingerprint),
    * ordered by id. Batch docs that are novel don't appear (they would
    * be appended to the index after this gate).
    */
  def probe(spark: SparkSession, batch: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val index = spark.read.parquet(path)
    batch
      .select(col(idCol), TextFunctions.tokenSetFingerprint(col(textCol)).as("fingerprint"))
      .join(index.select(col("fingerprint"), col("dup_of")), Seq("fingerprint"))
      .select(col(idCol), col("dup_of"), col("fingerprint"))
      .orderBy(col(idCol))
  }

  /** Merge a batch's NOVEL fingerprints into the stored index — the
    * post-gate step of the daily loop (probe gates, refresh admits).
    * Partition-aligned parquet APPEND: history files are never
    * rewritten, each novel row lands in its `fp_prefix` partition
    * directory. IDEMPOTENT: novelty is an anti-join against the index
    * as read before the append, so refreshing the same batch twice
    * appends nothing the second time (pinned by content hash in
    * `IncrementalDedupSpec`). `dup_of` for a novel cluster is the
    * batch's own min id — the same canonical-id policy as
    * [[writeIndex]].
    *
    * Concurrency contract (same as any parquet-append pipeline): one
    * refresh at a time per index path; the read's file listing is
    * snapshotted before the write begins, so a single refresh never
    * reads its own appends.
    */
  def refreshIndex(spark: SparkSession, batch: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val existing = spark.read.parquet(path).select(col("fingerprint"))
    batch
      .select(col(idCol), TextFunctions.tokenSetFingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint")).agg(min(col(idCol)).as("dup_of"))
      .join(existing, Seq("fingerprint"), "left_anti")
      .select(col("fingerprint"), col("dup_of"), prefixCol)
      .write.mode("append").partitionBy("fp_prefix").parquet(path)
  }
}
