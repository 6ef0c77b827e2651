package graft

import org.apache.spark.sql.SparkSession

/** Session factory (SURVEY §2.11 C5, mirroring the reference's
  * `src/utils.py:18-44` Kryo/compress config in Spark-4 terms).
  *
  * Everything engine code relies on is set HERE, at construction — no
  * operator or loader mutates session conf at runtime:
  *  - UTC session timezone (deterministic date/hour semantics),
  *  - AQE on (runtime shuffle coalescing + skew-join handling replaces
  *    the reference's hard-coded `repartition(200)` — C1/C2),
  *  - Kryo serializer (broadcast/shuffle of the engine's small dims),
  *  - `nanosAsLong` legacy flag so TIMESTAMP(NANOS) parquet (the events
  *    table) reads as long instead of failing PARQUET_TYPE_ILLEGAL.
  */
object Sessions {

  /** `local[cpus]` session with the engine's required configuration.
    * Shuffle partitions default to the cpu count — sized for single-node
    * local mode; a cluster deployment would raise it to ~2-3× total
    * cores. Default = all machine cores (the stated runtime contract is
    * local[32] on a 32-cpu box; the old hard default of 4 silently ran
    * every driver bench at 1/8 the machine).
    */
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors().toString),
      appName: String = "graft", maxTaskFailures: Int = 1): SparkSession = {
    // local-mode masters fix maxFailures at 1 unless spelled
    // local[N,F] — a cluster gets 4 by default; tests that exercise
    // task-retry determinism (RetrySpec) need F >= 2 here too
    val master = if (maxTaskFailures > 1) s"local[$cpus,$maxTaskFailures]" else s"local[$cpus]"
    configure(SparkSession.builder().master(master).appName(appName), cpus)
      .getOrCreate()
  }

  /** Apply the engine configuration to any builder (cluster or local). */
  def configure(b: SparkSession.Builder, shufflePartitions: String): SparkSession.Builder =
    b.withExtensions(GraftExtensions.register)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed-table location (bucketed tables) — keep out of the repo
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft-warehouse")
      // report bucketed scans' (bucketKeys, sortCols) order so operators
      // requiring it (the native as-of exec) plan sort-FREE over tables
      // written by Bucketing.writeBucketedSorted; only applies when a
      // bucket holds at most one file, which that writer guarantees
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
}
