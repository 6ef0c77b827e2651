package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve layout (Z-order/Morton and Hilbert) — the
  * data-clustering primitive for multi-dimensional pruning at 100 TB.
  * Sorting or range-partitioning a table by the curve key co-locates
  * rows that are close in BOTH dimensions, so per-file/per-row-group
  * min-max statistics prune 2-D range predicates (geo boxes, (time, key)
  * windows) that a single-column sort can only prune on its leading
  * column. Hilbert trades a slightly costlier key (a per-bit rotation
  * loop — see [[graft.expressions.HilbertIndex]]) for strictly better
  * locality: consecutive curve positions are always grid-adjacent, so
  * per-block bounding boxes are tighter than Morton's (asserted as a
  * property in ZOrderSpec). The reference has no layout concern (its
  * grids fit one machine); this is part of the scale surface built
  * beyond it.
  *
  * Everything is integer arithmetic after one deterministic quantization
  * step, so the q_geo_zorder_layout oracle replays cell ids, both curve
  * values, and block assignment exactly.
  */
object ZOrder {

  /** `bits`-bit cell id of `v` over [lo, hi): ⌊(v−lo)/(hi−lo)·2^bits⌋
    * clamped into [0, 2^bits) — values at/beyond the upper bound land in
    * the last cell.
    */
  def cellId(v: Column, lo: Double, hi: Double, bits: Int): Column =
    least(greatest(floor((v - lo) / (hi - lo) * (1L << bits).toDouble), lit(0L)),
      lit((1L << bits) - 1L))

  /** Morton interleave of two `bits`-bit cell ids: x occupies the even
    * bit positions, y the odd — a pure codegen'd bit expression (no UDF),
    * 2·bits terms wide.
    */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-value of a 2-D point, quantizing each dimension to `bits` bits. */
  def zValue(x: Column, xLo: Double, xHi: Double,
      y: Column, yLo: Double, yHi: Double, bits: Int): Column =
    interleave(cellId(x, xLo, xHi, bits), cellId(y, yLo, yHi, bits), bits)

  /** Hilbert index of two `bits`-bit cell ids — the better-locality
    * alternative to `interleave` (one custom codegen'd expression; the
    * rotation loop doesn't fit a flat Column formulation).
    */
  def hilbert(x: Column, y: Column, bits: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.HilbertIndex(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long")), bits))
  }

  /** Hilbert value of a 2-D point, quantizing each dimension to `bits`
    * bits.
    */
  def hilbertValue(x: Column, xLo: Double, xHi: Double,
      y: Column, yLo: Double, yHi: Double, bits: Int): Column =
    hilbert(cellId(x, xLo, xHi, bits), cellId(y, yLo, yHi, bits), bits)

  /** Write-side layout: range-partition by the z-value so each output
    * file covers a compact z-range (⇒ compact 2-D cell box) and carries
    * tight min-max stats on the z column for scan pruning. The sort
    * within partitions makes row-group stats monotone too.
    */
  def repartitionByZ(df: DataFrame, z: Column, numPartitions: Int): DataFrame =
    df.withColumn("zval", z)
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))
}
