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

  /** Covering z-ranges of the cell box [x0,x1]×[y0,y1] (inclusive cell
    * coordinates on the `bits`-bit grid): the EXACT union of Morton
    * values inside the box, as maximal disjoint [lo,hi] intervals. This
    * is the driver-side half of an index probe — it runs on the QUERY
    * constants, never the data (standard quadtree decomposition), and
    * the resulting BETWEEN predicates push into a z-sorted table's scan
    * where per-file/row-group min-max stats prune — a 2-D range query
    * answered through a 1-D layout. Range count is O(2^bits) (box
    * perimeter), not O(area); exactness is exhaustively asserted in
    * IndexProbeSpec.
    */
  def zQueryRanges(x0: Long, x1: Long, y0: Long, y1: Long, bits: Int): Seq[(Long, Long)] = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of [1, 31]")
    val lim = (1L << bits) - 1
    require(0 <= x0 && x0 <= x1 && x1 <= lim && 0 <= y0 && y0 <= y1 && y1 <= lim,
      s"box [$x0,$x1]x[$y0,$y1] outside the $bits-bit grid")
    def rec(cx: Long, cy: Long, k: Int, z: Long,
        acc: List[(Long, Long)]): List[(Long, Long)] = {
      val size = 1L << k
      if (cx + size - 1 < x0 || cx > x1 || cy + size - 1 < y0 || cy > y1) acc
      else if (cx >= x0 && cx + size - 1 <= x1 && cy >= y0 && cy + size - 1 <= y1)
        (z, z + size * size - 1) :: acc
      else {
        val h = size / 2
        // Morton puts x on the even bits: child order (0,0),(1,0),(0,1),(1,1)
        var a = rec(cx, cy, k - 1, z, acc)
        a = rec(cx + h, cy, k - 1, z + h * h, a)
        a = rec(cx, cy + h, k - 1, z + 2 * h * h, a)
        rec(cx + h, cy + h, k - 1, z + 3 * h * h, a)
      }
    }
    val sorted = rec(0, 0, bits, 0, Nil).sortBy(_._1)
    // coalesce z-adjacent ranges (quadrant order often emits contiguous runs)
    sorted.foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: rest, (lo2, hi2)) if lo2 == hi + 1 => (lo, hi2) :: rest
      case (acc, r) => r :: acc
    }.reverse
  }
}
