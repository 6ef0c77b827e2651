package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bootstrap confidence interval for a mean, with DETERMINISTIC
  * replicates: replicate b keeps a row iff an arithmetic hash of
  * (key, b) lands below half the hash space — half-sampling
  * (m-out-of-n bootstrap), replayable by any engine, no RNG state. The
  * spread of the replicate means is the sampling-error estimate that a
  * single full-data mean can't provide.
  *
  * Scale shape: all B replicates ride ONE scan as 2·B conditional
  * aggregates (map-side combined, single-row result) — no B-fold data
  * amplification, no shuffle of the fact table. The replicate frame is
  * then B rows; its sort is trivial. B is fixed; doubling data doubles
  * the scan, nothing else.
  */
object Bootstrap {

  private val M = 4294967296L // 2^32

  /** One row: (n_replicates, mean_cents, ci_lo_cents, ci_hi_cents) —
    * the full-data mean of `centsCol` and the [2nd, (B−1)th] order
    * statistics of the B half-sample replicate means (≈ 94% CI at
    * B = 32). `keyCol` must be integral non-negative; `centsCol` an
    * exact integer measure.
    */
  def halfSampleCi(df: DataFrame, keyCol: String, centsCol: String,
      b: Int = 32): DataFrame = {
    require(b >= 4, s"b=$b must be >= 4")
    def keep(i: Int) =
      pmod(col(keyCol).cast("long") * 2654435761L + lit(i.toLong * 1013904223L),
        lit(M)) < lit(M / 2)
    val aggs =
      Seq(sum(col(centsCol).cast("long")).as("s_full"),
        count(lit(1)).as("n_full")) ++
        (0 until b).flatMap { i =>
          Seq(sum(when(keep(i), col(centsCol).cast("long")).otherwise(0L)).as(s"s_$i"),
            sum(when(keep(i), 1L).otherwise(0L)).as(s"n_$i"))
        }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val reps = wide.select(col("s_full"), col("n_full"),
        explode(array((0 until b).map { i =>
          struct(lit(i).as("b"), col(s"s_$i").as("s"), col(s"n_$i").as("n"))
        }: _*)).as("r"))
      .select(col("s_full"), col("n_full"),
        col("r.b").as("b"), (col("r.s").cast("double") / col("r.n")).as("mean_b"))
    // B rows: the single-partition rank window is trivially safe
    val ranked = reps.withColumn("rn",
      row_number().over(Window.orderBy(col("mean_b"), col("b"))))
    ranked.agg(
      count(lit(1)).as("n_replicates"),
      round(min(col("s_full").cast("double") / col("n_full")), 2).as("mean_cents"),
      round(min(when(col("rn") === 2, col("mean_b"))), 2).as("ci_lo_cents"),
      round(min(when(col("rn") === b - 1, col("mean_b"))), 2).as("ci_hi_cents"))
  }
}
