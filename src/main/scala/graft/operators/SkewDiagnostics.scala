package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-key skew diagnostics: the top heavy-hitter keys with their share
  * and cumulative share of all rows — the audit a pipeline runs BEFORE
  * a big join to decide between a plain shuffle join, AQE skew
  * splitting, or explicit salting ([[SaltedJoin.deriveSalts]] consumes
  * exactly this shape, and [[SkewAsOfJoin.asOfAuto]] runs the same
  * histogram extended with per-key time spans — folded into ONE rollup
  * job — to auto-route hot keys through the bucketed as-of rewrite).
  * A key holding >1% of 100 TB is a straggler task
  * by construction; this makes it visible before it burns a stage.
  *
  * 100 TB design: one map-side-combined count per key, then a top-k
  * TakeOrdered — the full histogram never sorts globally and never
  * reaches the driver; the scalar total rides a broadcast.
  */
object SkewDiagnostics {

  /** Top-`k` keys by row count. Output: (rk int, key (as string), cnt
    * long, share double r6, cum_share double r6), ordered by rank.
    * The cumulative sum runs over the rank-ordered top-k frame (k rows),
    * so the float path is deterministic.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    // nulls LAST on the key tie-break (Spark's asc default is nulls
    // first; DuckDB's is nulls last — null join keys are a classic heavy
    // hitter, so the tie order must match the oracle's)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key").asc_nulls_last)
    counts
      .orderBy(col("cnt").desc, col("key").asc_nulls_last).limit(k)
      .crossJoin(broadcast(total))
      .withColumn("rk", row_number().over(w))
      .withColumn("share", col("cnt").cast("double") / col("total").cast("double"))
      .withColumn("cum_share", sum(col("share")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("rk"), col("key"), col("cnt"),
        round(col("share"), 6).as("share"), round(col("cum_share"), 6).as("cum_share"))
  }
}
