package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k-per-group via window rank + filter (reference pattern
  * `src/preprocess.py:74-93`: rank ≤ k nearest roads per accident).
  *
  * Spark ≥3.5 rewrites rank-filter-over-window into
  * `WindowGroupLimitExec`, which keeps only k rows per group on the map
  * side before the shuffle — so at 100 TB this does NOT materialize whole
  * groups; it's the plan you'd hand-write.
  */
object TopK {

  /** Rows ranked ≤ k per group. `dense` keeps ties (rank), otherwise
    * row_number with the given deterministic order.
    */
  def perGroup(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column], k: Int,
      keepTies: Boolean = false, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val r = if (keepTies) rank().over(w) else row_number().over(w)
    df.withColumn(rankCol, r).filter(col(rankCol) <= k)
  }
}
