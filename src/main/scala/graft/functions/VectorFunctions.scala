package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns using
  * Spark's higher-order functions (`zip_with` / `aggregate` /
  * `transform`) — all codegen-friendly built-ins, no UDFs, so they stay
  * inside whole-stage codegen on the ANN hot path.
  */
object VectorFunctions {

  /** Cast an array<float> to array<double> (stable cross-engine math) —
    * a plain element Cast (codegen'd), not an interpreted transform().
    */
  def toDoubleArray(v: Column): Column =
    v.cast(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  /** Dot product of two numeric arrays (left-to-right summation) — the
    * engine's one custom Catalyst expression; see
    * [[graft.expressions.DotProduct]] for why the HOF formulation isn't
    * viable on the per-pair hot path.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    // the casts guarantee the expression's array<double> precondition and
    // are no-ops (optimized away) when inputs are already double arrays
    Bridge.column(graft.expressions.DotProduct(
      Bridge.expression(toDoubleArray(a)), Bridge.expression(toDoubleArray(b))))
  }

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Squared euclidean distance. */
  def euclideanSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane SimHash sign bits packed into a long, for LSH
    * bucketing of embeddings: bit i = sign(dot(v, plane_i)). Planes are a
    * deterministic pseudo-random matrix derived from (i, j) via a hash —
    * reproducible across runs with zero data movement.
    */
  /** The hyperplane for bit `i`: dim doubles in [-0.5, 0.5), a
    * deterministic hash of (seed, i, j). Exposed so oracle SQL can embed
    * the IDENTICAL literals and replay the bucketing bit for bit.
    */
  def planeValues(seed: Long, i: Int, dim: Int): IndexedSeq[Double] =
    (0 until dim).map { j =>
      val h = ((seed * 1000003L + i * 8191L + j) * 0x9E3779B97F4A7C15L)
      ((h >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }

  def hyperplaneSimHash(v: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    require(nBits <= 63, "packed into a signed long")
    val bits = (0 until nBits).map { i =>
      // The plane ships as ONE array literal and the projection is a
      // zip_with/aggregate dot product — a per-element expression chain
      // (dim × nBits scalar nodes) made Catalyst analysis + codegen the
      // dominant cost once multi-table LSH multiplied the tree size.
      val d = aggregate(
        zip_with(v, typedLit(planeValues(seed, i, dim)), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
