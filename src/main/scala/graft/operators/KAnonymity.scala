package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit: group records by their
  * quasi-identifier combination and report how re-identifiable the
  * table is — the privacy screen a dataset needs BEFORE release or
  * training (PII scrubbing (X18) removes direct identifiers; this
  * measures what the remaining attribute combinations still leak). A
  * table is k-anonymous when every equivalence class has ≥ k rows, and
  * l-diverse when each class carries ≥ l distinct sensitive values.
  *
  * 100 TB design: one two-level map-side-combined aggregate — (QI
  * combo, sensitive) distinct-collapse, then the combo rollup, then a
  * ≤ |distinct class size| histogram; the raw table shuffles once and
  * nothing returns to the driver.
  */
object KAnonymity {

  /** Histogram of equivalence-class sizes with diversity: one row per
    * class size — (class_size, n_classes, n_rows, min_diversity,
    * at_risk = class_size < k). The k-anonymity verdict is "no row
    * with at_risk = true"; the l-diversity floor is min over
    * min_diversity.
    */
  def audit(df: DataFrame, quasiIdCols: Seq[String], sensitiveCol: String,
      k: Long): DataFrame = {
    require(quasiIdCols.nonEmpty, "audit: at least one quasi-identifier")
    require(k >= 2, s"audit: k must be >= 2, got $k")
    val classes = df
      .groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("n"), countDistinct(col(sensitiveCol)).as("ndiv"))
    classes
      .groupBy(col("n").as("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n")).as("n_rows"),
        min(col("ndiv")).as("min_diversity"))
      .withColumn("at_risk", col("class_size") < k)
  }
}
