package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine (date, hour) grid generation (SURVEY S6): the reference
  * builds these frames with a driver-side Python loop over every
  * day × 24 hours (`/root/reference/src/preprocess.py:226-254`) — at
  * engine scale that's a driver bottleneck and a createDataFrame ship.
  * Here the grid is declared with `sequence` + `explode`, so generation
  * is distributed, lazy, and prunable (a filter on the year never
  * generates the other years).
  */
object DateGrid {

  /** All (date, hour) slots for the given years: |years| × ~365 × 24
    * rows. One row per day from `sequence(start, end, 1 day)`, exploded,
    * then 24 hours per day from a second sequence — both codegen'd
    * generators, no shuffle at all.
    */
  def dateHourGrid(spark: SparkSession, years: Seq[Int]): DataFrame = {
    import spark.implicits._
    years.toDF("year")
      .select(explode(sequence(
        make_date(col("year"), lit(1), lit(1)),
        make_date(col("year"), lit(12), lit(31)),
        expr("interval 1 day"))).as("date"))
      .select(col("date"), explode(sequence(lit(0), lit(23))).as("hour"))
  }

  /** Grid joined against per-slot sample keys (the reference's negative
    * grid: dates × street_ids, `src/preprocess.py:290`), with optional
    * deterministic hash sampling BEFORE any feature join — the
    * sample-early discipline the reference applies to bound the
    * 539k × 44k blowup (`src/preprocess.py:269-271,293`).
    */
  def negativeGrid(grid: DataFrame, keys: DataFrame, keyCol: String,
      sampleFraction: Double = 1.0, seed: Long = 42L): DataFrame = {
    val crossed = grid.crossJoin(keys)
    val sampled =
      if (sampleFraction >= 1.0) crossed
      else crossed.filter(
        graft.ml.RandomUnderSampler.hashKeepScore(
          hash(col("date"), col("hour"), col(keyCol)).cast("long"), seed) < sampleFraction)
    // P7+P8: synthetic ids, sign-flipped so negative-sample ids can never
    // collide with positive-sample ids downstream (the reference's
    // `sample_id = -1 * sample_id`, src/preprocess.py:295-297,472)
    sampled.withColumn("sample_id", -(monotonically_increasing_id() + lit(1L)))
  }
}
