package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-skipping (manifest) audit: per file, the column's min/max
  * footer stats, whether a range predicate would SCAN the file
  * (stats overlap the range), and how many rows actually match — the
  * lakehouse question "is our layout earning its keep?" answered with
  * numbers: scanned-but-zero-hit files are wasted I/O the sort order
  * should have skipped, and their count is the concrete payoff of a
  * re-cluster pass ([[ZOrder]] / [[CompactionPlan]] are the remedies;
  * this is the meter).
  *
  * Scale shape (100 TB): ONE map-side-combined aggregate collapses
  * the table to a row per file (a manifest is millions of rows,
  * metadata-scale); the verdict columns are row-local expressions on
  * that rollup. In a real lake the stats come free from parquet
  * footers — the audit's point is joining them against TRUE hit
  * counts, which only a scan can provide, done here in the same pass.
  */
object ManifestPrune {

  /** (file_id, n_rows, v_min, v_max, scanned, n_hits) per file for
    * the range predicate lo <= valueCol <= hi; `fileCol` derives the
    * file identity (e.g. `doc_id div rowsPerFile` for a synthetic
    * layout, or an actual `input_file_name()`).
    */
  def rangeAudit(df: DataFrame, fileCol: Column, valueCol: String,
      lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"rangeAudit: lo=$lo must be <= hi=$hi")
    df.groupBy(fileCol.as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).cast("long").as("v_min"),
        max(col(valueCol)).cast("long").as("v_max"),
        sum(when(col(valueCol) >= lo && col(valueCol) <= hi, 1L).otherwise(0L))
          .as("n_hits"))
      .withColumn("scanned", !(col("v_max") < lo || col("v_min") > hi))
      .select(col("file_id"), col("n_rows"), col("v_min"), col("v_max"),
        col("scanned"), col("n_hits"))
      .orderBy(col("file_id"))
  }
}
