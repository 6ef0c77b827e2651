package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (SURVEY §4 / the 100 TB playbook): persisting
  * both sides of a recurring join bucketed BY THE JOIN KEY lets Spark
  * plan the join with zero Exchange — the shuffle is paid once at write
  * time and amortized over every subsequent join, the standard layout
  * for fact-to-fact joins too big to broadcast.
  *
  * Requires `saveAsTable` (bucket metadata lives in the catalog, not in
  * parquet); `BucketingSpec` asserts the joined plan is shuffle-free.
  */
object Bucketing {

  /** Persist `df` bucketed (and sorted) by `keys` into `nBuckets`. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — planned
    * without any Exchange when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
