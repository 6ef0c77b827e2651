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

  /** Per-JVM nonce for derived table names: two PROCESSES running the
    * same query over the same data dir (bench + correctness is the real
    * scenario) must not share a catalog table name, or one process's
    * [[resetTable]] deletes the location mid-scan of the other. Within
    * one JVM the name is stable, so re-runs reuse/overwrite cleanly.
    */
  lazy val runTag: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  /** Drop `table` and clear its managed location. A leftover warehouse
    * directory from a previous JVM (the in-memory catalog dies with the
    * session, the files do not) makes the next `saveAsTable` fail with
    * "location already exists" — every bucketed write goes through this
    * first so re-runs are idempotent across process restarts.
    */
  def resetTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val loc = new java.io.File(wh, table.toLowerCase(java.util.Locale.ROOT))
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
  }

  /** Persist `df` bucketed (and sorted) by `keys` into `nBuckets`. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int, keys: Seq[String]): Unit = {
    resetTable(df.sparkSession, table)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys — planned
    * without any Exchange when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)

  /** Persist `df` bucketed by `bucketKeys` AND sorted by
    * (bucketKeys ++ sortCols), with EXACTLY ONE file per bucket — the
    * layout that makes subsequent sort-merge operators on
    * (bucketKeys, sortCols.head) both exchange-free AND sort-free:
    * Spark's scan only reports a bucket's sort order when the bucket
    * holds at most one file, so the write first repartitions into
    * `nBuckets` hash partitions on `bucketKeys`. That repartition uses
    * the SAME murmur3 `pmod(hash, n)` the bucket-id assignment uses, so
    * every writer task holds exactly one bucket's rows and emits
    * exactly one file.
    *
    * The payoff (pinned in `BucketedAsOfSpec`): the native as-of join
    * over two filtered reads of such a table plans with ZERO Exchange
    * and ZERO Sort on either side — at 100 TB, an event log bucketed
    * this way once answers every subsequent as-of/attribution query
    * with no shuffle and no sort at all, the cheapest possible plan
    * for the operator. (Filters and pure column aliases both preserve
    * the scan's partitioning and ordering; a DERIVED time column —
    * e.g. unix_micros(ts)+x — would not, and the sort would return.)
    */
  def writeBucketedSorted(df: DataFrame, table: String, nBuckets: Int,
      bucketKeys: Seq[String], sortCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    resetTable(df.sparkSession, table)
    val sorted = bucketKeys ++ sortCols
    df.repartition(nBuckets, bucketKeys.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(nBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
