package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension embedding diagnostics: mean and variance of every
  * vector dimension across the corpus, ranked by variance — the check
  * that finds dead dimensions (variance ≈ 0: wasted bytes in every
  * index) and dominant ones (candidates for rotation/whitening before
  * PQ), complementing [[EmbeddingDrift]]'s per-group centroid view
  * with a per-coordinate corpus view.
  *
  * Determinism contract: float coordinates widen to double exactly,
  * then quantize to integer micros, so all moment sums are exact longs
  * and the variance RANKING compares the integer numerator
  * n·Σx² − (Σx)² — no float enters until the final displayed division.
  *
  * Scale shape: one posexplode + map-side-combined groupBy to a
  * dim-count frame (64–4096 rows however large the corpus); top-k by
  * variance is a TakeOrdered on that frame.
  */
object EmbeddingProfile {

  /** Top-`k` dimension PAIRS by |covariance|: (i, j, n, cov) for i < j —
    * the cross-dimension redundancy diagnostic (a pair with high
    * |covariance| is a rotation/whitening candidate; a near-diagonal
    * covariance matrix says PQ subspaces can be cut without a rotation
    * first). Same determinism contract as [[topVarianceDims]]:
    * quantize to integer micros, rank on the exact integer numerator
    * n·Σxy − Σx·Σy (DECIMAL(38) — at corpus scale n·Σxy outgrows a
    * long; DuckDB mirrors with HUGEINT), floats only in the displayed
    * division.
    *
    * Scale shape: the double posexplode blows each vector to d(d+1)/2
    * pair rows, but the groupBy is map-side combined into a d²-sized
    * frame — the shuffle and the output never exceed d(d+1)/2 rows
    * (2080 at d=64) regardless of corpus size. The pair explode is the
    * honest cost (d² work per row is what a Gram matrix IS); memory
    * stays flat because nothing materializes per-vector state.
    */
  def covarianceTopK(embeddings: DataFrame, vecCol: String, k: Int = 15): DataFrame = {
    val dec = "decimal(38,0)"
    // fan the narrow scan out first: the d²/2 pair explosion below is
    // the operator's whole cost and would otherwise run fused onto a
    // one-task scan (guide §2.5; single file + single row group)
    val byDim = ScanFanout.byKey(embeddings, col(vecCol))
      .select(posexplode(col(vecCol)).as(Seq("i", "xi")), col(vecCol).as("vec"))
      .select(col("i"), round(col("xi").cast("double") * 1000000).cast("long").as("vi"),
        col("vec"))
      .select(col("i"), col("vi"), posexplode(col("vec")).as(Seq("j", "xj")))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"), col("vi"),
        round(col("xj").cast("double") * 1000000).cast("long").as("vj"))
    val m = byDim.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("vi").cast(dec)).as("s1"),
        sum(col("vj").cast(dec)).as("s2"),
        sum((col("vi") * col("vj")).cast(dec)).as("sxy"))
      .withColumn("cov_num",
        col("n").cast(dec) * col("sxy") - col("s1") * col("s2"))
    m.orderBy(abs(col("cov_num")).desc, col("i"), col("j"))
      .limit(k)
      .select(col("i"), col("j"), col("n"),
        // n as double BEFORE squaring: a long n² wraps past ~3.0e9 rows,
        // exactly the corpus scale this operator's exactness story targets
        round(col("cov_num").cast("double") /
          (col("n").cast("double") * col("n")) / 1.0e12, 6).as("cov"))
  }

  /** Johnson–Lindenstrauss random projection with a REPLAYABLE sign
    * matrix: y_j = Σ_i s(i,j)·q_i over the micro-quantized coordinates
    * q_i, where s(i,j) = ±1 comes from a double-mixed multiplicative
    * hash (xor of the two per-index products, re-multiplied — one
    * multiply alone leaves the parity correlated with i+j; all
    * arithmetic stays under 2⁶³ so ANSI mode never throws). Output is
    * the EXACT integer projection (vec_id, j, y) — no float leaves the
    * operator, so an external engine replays every bit.
    *
    * Scale shape: entirely per-row (zip_with + aggregate inside
    * whole-stage codegen — no explode, no shuffle, no broadcast
    * projection matrix since the "matrix" is a hash); a 100 TB corpus
    * projects in one map pass at d·k multiplies per row. Distance/norm
    * preservation (E[‖y‖²] = k·‖q‖², JL distortion bands) pinned in
    * `RandomProjectionSpec`.
    */
  def randomProject(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int = 16): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val M = 4294967296L
    def sign(i: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) = {
      val h0 = pmod((i * lit(2654435761L)).bitwiseXOR(j * lit(2246822519L)), lit(M))
      val h = pmod(h0 * lit(48611L), lit(M))
      when(h < lit(2147483648L), lit(1L)).otherwise(lit(-1L))
    }
    val q = transform(col(vecCol),
      x => round(x.cast("double") * 1000000).cast("long"))
    val proj = transform(sequence(lit(0), lit(k - 1)), j =>
      aggregate(
        zip_with(q, sequence(lit(0L), size(col(vecCol)).cast("long") - 1),
          (v, i) => sign(i, j.cast("long")) * v),
        lit(0L), (acc, v) => acc + v))
    embeddings
      // a size-0 vector would make sequence(0, -1) auto-step to [0, -1]
      // and zip_with pad — k spurious null-y rows; an empty embedding has
      // no projection, matching the oracle's empty per-dim expansion
      .filter(size(col(vecCol)) > 0)
      .select(col(idCol).as("vec_id"), posexplode(proj).as(Seq("j", "y")))
  }

  /** Top-`k` dimensions by variance: (dim, n, mean, variance), ties on
    * the integer variance numerator break to the lower dim index.
    */
  def topVarianceDims(embeddings: DataFrame, vecCol: String, k: Int = 10): DataFrame = {
    val exploded = embeddings
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim"), round(col("x").cast("double") * 1000000).cast("long").as("v"))
    val m = exploded.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
      .withColumn("var_num", col("n") * col("s2") - col("s1") * col("s1"))
    m.orderBy(col("var_num").desc, col("dim"))
      .limit(k)
      .select(col("dim"), col("n"),
        round(col("s1").cast("double") / col("n") / 1000000.0, 6).as("mean"),
        // same n²-overflow guard as covarianceTopK
        round(col("var_num").cast("double") /
          (col("n").cast("double") * col("n")) / 1.0e12, 6).as("variance"))
  }
}
