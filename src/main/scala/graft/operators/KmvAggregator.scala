package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Result of a KMV aggregation: the sketch size actually filled, the
  * k-th smallest hash, and the distinct-count estimate.
  */
case class KmvResult(m: Long, hk: Long, est: Double)

/** [[KmvSketch]] as a typed `Aggregator[IN, BUF, OUT]` — the UDAF
  * surface of the engine (SURVEY §2.9: the reference defines none, so
  * this is the completeness demo): the same k-minimum-values estimate
  * as the window-based operator, but with the sketch as the
  * AGGREGATION BUFFER — k sorted hashes per group, combined map-side,
  * merged associatively across partitions (union → retake k smallest).
  * That makes it usable anywhere an aggregate goes: `Dataset.agg`,
  * `groupBy.agg`, SQL via `udaf(...)` registration, and streaming
  * state — places the window formulation can't reach.
  *
  * The buffer is a sorted distinct Array[Long] of ≤ k entries, so
  * per-partition state is O(k) regardless of input size, and `merge`
  * is a linear merge of two sorted runs. The hash is the same
  * arithmetic (Knuth multiplicative mod 2³²) the oracle replays.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], KmvResult] {
  require(k >= 2, s"k=$k must be >= 2")

  private val M = 4294967296L

  private def hash(key: Long): Long = {
    val p = (key * 2654435761L) % M
    if (p < 0) p + M else p
  }

  override def zero: Array[Long] = Array.empty

  /** Insert the key's hash, keeping the buffer sorted, distinct, ≤ k. */
  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    val h = hash(key)
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length >= k && ins >= k) buf // larger than the k-th smallest
      else {
        val out = new Array[Long](math.min(buf.length + 1, k))
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, out.length - ins - 1)
        out
      }
    }
  }

  /** Linear merge of two sorted runs, dedup, first k survive. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var (i, j, n) = (0, 0, 0)
    var last = Long.MinValue
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (v != last || n == 0) { out(n) = v; last = v; n += 1 }
    }
    if (n == out.length) out else out.take(n)
  }

  override def finish(buf: Array[Long]): KmvResult = {
    val m = buf.length.toLong
    if (m == 0) KmvResult(0L, 0L, 0.0)
    else if (m < k) KmvResult(m, buf.last, m.toDouble)
    else KmvResult(m, buf.last, (k - 1).toDouble * M / buf.last)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
}
