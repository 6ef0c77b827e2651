package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan fan-out for CPU-heavy map phases over narrow inputs
  * (optimization guide §2.5 "input skew: one huge unsplittable file").
  *
  * A parquet file is splittable only at row-group boundaries; a table
  * written as one file with one row group plans as ONE scan task, so
  * every map-side operation fused onto that scan — tokenization,
  * shingle explosion, per-row hashing, partial aggregation — runs on a
  * single core no matter how many the session has. The fix is one
  * deterministic hash repartition of the (narrow, pre-explosion) input
  * before the expensive map work: the exchange moves the small input
  * bytes once, and the heavy per-row work then runs at full session
  * parallelism.
  *
  * Scale-adaptive by construction, NOT a local[32] tuning constant: the
  * repartition only fires when the planned scan parallelism is below
  * the session's shuffle partitioning (`spark.sql.shuffle.partitions` —
  * already the conf a cluster deployment raises). A 100 TB table scans
  * as thousands of splits, `current >= target` holds, and this is a
  * no-op — exactly the behaviour the guide asks for ("repartition
  * immediately after the read" only when the read is the bottleneck).
  *
  * The explicit partition count pins the exchange against AQE partition
  * coalescing: the input is small by definition here (that is why it
  * planned one task), so AQE would immediately coalesce a keyless or
  * count-free repartition back to one reader and re-serialize the map
  * phase it was meant to spread.
  *
  * Determinism: hash partitioning on a real key column is stable under
  * task retry (guide §2.5 warns only about rand()-derived keys), and
  * every caller feeds aggregations/joins whose results are independent
  * of row placement, so query results are bit-identical.
  */
object ScanFanout {

  /** `df` hash-repartitioned on `key` to the session's shuffle
    * parallelism, when (and only when) its planned parallelism is
    * materially below that; unchanged otherwise.
    *
    * CONTRACT: `df` must be a raw scan (or narrow projections/filters
    * of one). The parallelism probe resolves `df.rdd`, which is
    * planning-only for a scan — but under AQE it would EXECUTE any
    * upstream shuffle stages of a derived frame (and the caller's real
    * query would then run them again in its own QueryExecution): wrap
    * the input before the first wide operation, never after.
    */
  def byKey(df: DataFrame, key: Column): DataFrame = {
    // streaming relations cannot be planned eagerly (`.rdd` throws) and
    // batch their own parallelism per micro-batch — pass them through
    if (df.isStreaming) return df
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    // planning-only for a scan (no job) — see the contract above
    val current = df.rdd.getNumPartitions
    if (current * 2 <= target) df.repartition(target, key) else df
  }
}
