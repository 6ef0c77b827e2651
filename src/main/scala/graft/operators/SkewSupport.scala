package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Shared machinery of the two skew-aware join wrappers
  * ([[SkewAsOfJoin]], [[SkewIntervalJoin]]) — one implementation so a
  * change to the time-type contract, the floor-division arithmetic, or
  * the hot-key selection semantics cannot silently diverge between the
  * "symmetric" operators.
  */
private[operators] object SkewSupport {

  /** Normalize a time column to long (micros for timestamps) — the one
    * time-type contract of the whole skew family.
    */
  def asLong(c: Column, dt: org.apache.spark.sql.types.DataType, who: String): Column =
    dt match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => unix_micros(c)
      case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        c.cast("long")
      case other => throw new IllegalArgumentException(
        s"$who: time column must be int/long/timestamp, got ${other.sql}")
    }

  /** Exact integer floor(t / w) as a column, without `div`'s
    * truncate-toward-zero bias on negatives: pmod is non-negative, so
    * (t - pmod(t, w)) is an exact multiple of w, and the double
    * division of exact multiples is exact for |t| < 2^53 (micros until
    * year ~2255).
    */
  def floorDivCol(t: Column, w: Long): Column =
    ((t - pmod(t, lit(w))) / lit(w)).cast("long")

  /** ONE map-side-combined pass over the big side: per-key count + time
    * span, with the grand total folded into the SAME job as the
    * rollup() super-aggregate row (null keys are pre-filtered, so the
    * one null-key output row IS the total, and it sorts first because
    * total >= every per-key count). Returns the rows whose share of the
    * total is >= `hotShareThreshold` (each Row = [key, cnt, tmin,
    * tmax]) and the total — histogram + total + top-k in one aggregate
    * and a TakeOrdered of maxHotKeys+1 rows; nothing corpus-sized near
    * the driver.
    */
  def hotKeyHistogram(df: DataFrame, key: String, time: String,
      hotShareThreshold: Double, maxHotKeys: Int, who: String): (Array[Row], Long) = {
    require(hotShareThreshold > 0 && hotShareThreshold <= 1,
      s"$who: hotShareThreshold must be in (0, 1], got $hotShareThreshold")
    val dt = df.schema(time).dataType
    val top = df
      .filter(col(key).isNotNull && col(time).isNotNull)
      .select(col(key), asLong(col(time), dt, who).as("__t"))
      .rollup(col(key)).agg(
        count(lit(1)).as("__cnt"), min(col("__t")).as("__tmin"), max(col("__t")).as("__tmax"))
      .orderBy(col("__cnt").desc, col(key).asc_nulls_last).limit(maxHotKeys + 1)
      .collect()
    val total = top.find(_.isNullAt(0)).map(_.getLong(1)).getOrElse(0L)
    val hot = top.filter { r =>
      !r.isNullAt(0) && total > 0 &&
        r.getLong(1).toDouble / total.toDouble >= hotShareThreshold
    }
    (hot, total)
  }

  /** Point-density width: min over hot keys of span / ceil(cnt /
    * targetRowsPerBucket) — every hot key's expected densest bucket
    * lands ≈ targetRowsPerBucket assuming time-uniform arrival.
    */
  def densityWidth(hot: Array[Row], targetRowsPerBucket: Long): Long =
    hot.map { r =>
      val (cnt, tmin, tmax) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val nBuckets = ((cnt + targetRowsPerBucket - 1) / targetRowsPerBucket).max(1L)
      ((tmax - tmin) / nBuckets).max(1L)
    }.min
}
