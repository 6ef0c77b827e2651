package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency audit: does column A determine column B? For
  * each candidate pair, count the determinant groups whose dependent
  * takes more than one value — the data-quality check behind
  * normalization review, key discovery, and silent-corruption alarms
  * (an FD that held for years suddenly growing violations is an
  * upstream bug). Complements [[TableProfiler]] (per-column stats) with
  * cross-column structure.
  *
  * 100 TB design: one map-side-combined two-level aggregate per pair —
  * (det, dep) distinct-collapse, then the det rollup; nothing quadratic
  * and no count(distinct) over the raw table. Pairs audit
  * independently; unionByName stitches the tiny result rows.
  */
object FdAudit {

  /** Audit (det → dep) on one frame: ONE row
    * (det, dep, n_groups, n_violating, max_distinct).
    */
  def auditPair(df: DataFrame, det: String, dep: String): DataFrame =
    df.groupBy(col(det)).agg(countDistinct(col(dep)).as("nd"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("nd")).as("max_distinct"))
      .select(lit(det).as("det"), lit(dep).as("dep"),
        col("n_groups"), col("n_violating"), col("max_distinct"))

  /** Audit a list of pairs over (possibly different) frames. */
  def audit(pairs: Seq[(DataFrame, String, String)]): DataFrame =
    pairs.map { case (df, det, dep) => auditPair(df, det, dep) }
      .reduce(_.unionByName(_))
}
