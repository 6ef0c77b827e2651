package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005): a depth × width
  * grid of counters; each key increments one counter per row (chosen by
  * that row's hash); a point estimate is the MIN over the key's cells —
  * always an over-estimate, with error ≤ εN at depth ln(1/δ) rows.
  *
  * The cell counts are plain `groupBy(j, bucket).count` — map-side
  * combined, constant output size (≤ depth·width rows) no matter the
  * input — and the hash family is the md5 split this repo's oracle
  * queries replay in DuckDB, so the SKETCH ITSELF is deterministic and
  * externally checkable, not just its error bound.
  *
  * Scale shape (100 TB): the build is one shuffle whose key space is
  * depth·width cells (map-side combine collapses each partition to at
  * most that many rows first); sketches from different partitions,
  * days, or streams merge by cell-wise SUM — the mergeability that
  * makes CMS the standard distributed/streaming counter. Point queries
  * broadcast the constant-size sketch.
  */
object CountMinSketch {

  /** Row-j hash of a key into [0, width): 8-hex-char (32-bit) SLICES of
    * md5 digests. Rows 0-3 slice one digest of the bare key — the
    * engine's common-subexpression elimination computes that md5 ONCE
    * per input row, so a depth-4 build hashes each row once instead of
    * four times (the digest was the build's dominant cost at sf0.1 and
    * scales linearly with rows at 100 TB); rows 4+ salt the key with
    * `j/4` and slice the next digest. Disjoint slices of a
    * cryptographic digest are the standard cheap independent-row
    * family; 32 bits comfortably covers the ≤ 2^16 widths in use and
    * stays ANSI-safe (< 2^63) before the modulo.
    */
  def cellHash(key: Column, j: Int, width: Int): Column = {
    val digest =
      if (j < 4) md5(key.cast("string").cast("binary"))
      else md5(concat_ws(":", key, lit(j / 4)).cast("binary"))
    conv(substring(digest, 1 + 8 * (j % 4), 8), 16, 10).cast("long") % width
  }

  /** Build the sketch: one row per non-empty cell (j, bucket, cnt). */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"depth=$depth width=$width")
    // fan out before hashing: the per-row md5 digest(s) + depth-way
    // explode + map-side combine otherwise run fused onto a one-task
    // scan of a single-row-group parquet file (guide §2.5)
    ScanFanout.byKey(df.select(col(keyCol)), col(keyCol))
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), cellHash(col(keyCol), j, width).as("bucket"))): _*)).as("_c"))
      .groupBy(col("_c.j").as("j"), col("_c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Join-cardinality estimate from two sketches over the SAME hash
    * family: the CMS inner product — Σ_cells a·b per row, min over
    * rows — upper-bounds |A ⋈ B| on the sketched key (Cormode &
    * Muthukrishnan §4.2). This is the classic sketch-based join-size
    * estimator: planners compare it against broadcast thresholds
    * WITHOUT touching either table. All integer arithmetic.
    * Output: one row (est_join_size long).
    */
  def innerProduct(sketchA: DataFrame, sketchB: DataFrame): DataFrame = {
    val b = sketchB.select(col("j"), col("bucket"), col("cnt").as("cnt2"))
    sketchA.join(b, Seq("j", "bucket"))
      .groupBy(col("j")).agg(sum(col("cnt") * col("cnt2")).as("est"))
      .agg(min(col("est")).as("est_join_size"))
  }

  /** Point-estimate each probe key against a built sketch: min over the
    * key's depth cells; a key addressing an absent cell estimates 0.
    * The sketch side is broadcast — it is ≤ depth·width rows by
    * construction.
    */
  def pointEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val cells = probes.select(col(keyCol),
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("j"), cellHash(col(keyCol), j, width).as("bucket"))): _*)).as("_c"))
      .select(col(keyCol), col("_c.j").as("j"), col("_c.bucket").as("bucket"))
    cells
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
