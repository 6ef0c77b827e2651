package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract audit: evaluate a suite of per-column expectations —
  * null-rate, value range, pattern conformance, cardinality cap — in
  * ONE pass over the table and emit a verdict row per expectation. The
  * "expectation suite" gate every ingestion pipeline runs before
  * publishing a snapshot: a contract violation should fail the load,
  * not surface three jobs downstream as a skewed join or a NaN metric.
  *
  * All metrics are exact long counts (no sampled rates), so the audit
  * hash-replays on any engine and a pass/fail flip is attributable to
  * actual rows, not sketch variance.
  *
  * Scale shape (100 TB): the row-level checks compile into a single
  * map-side-combined aggregate over one scan — conditional sums, no
  * shuffle of the fact. Cardinality caps use exact count-distinct
  * (Spark plans the expand + partial aggregate); swap for
  * approx_count_distinct in the operator call if the audited column is
  * high-cardinality and the cap is advisory.
  */
object DataContract {

  /** One expectation over one column. `metric` is what the audit
    * counts; `bound` is the allowed maximum; pass = metric <= bound.
    */
  sealed trait Expectation {
    def column: String
    def check: String
    def bound: Long
    private[DataContract] def metric: Column
  }

  /** At most `maxBad` null values (default 0). */
  final case class NotNull(column: String, maxBad: Long = 0L) extends Expectation {
    val check = "not_null"
    val bound = maxBad
    private[DataContract] def metric =
      sum(when(col(column).isNull, 1L).otherwise(0L))
  }

  /** At most `maxBad` non-null values outside [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double,
      maxBad: Long = 0L) extends Expectation {
    val check = "in_range"
    val bound = maxBad
    private[DataContract] def metric =
      sum(when(col(column).isNotNull && (col(column) < lo || col(column) > hi), 1L)
        .otherwise(0L))
  }

  /** At most `maxBad` non-null values NOT matching `pattern` (RE2-free
    * Java regex, anchored by the caller).
    */
  final case class MatchesRegex(column: String, pattern: String,
      maxBad: Long = 0L) extends Expectation {
    val check = "matches_regex"
    val bound = maxBad
    private[DataContract] def metric =
      sum(when(col(column).isNotNull && !col(column).rlike(pattern), 1L)
        .otherwise(0L))
  }

  /** Exact distinct count at most `cap`. */
  final case class MaxDistinct(column: String, cap: Long) extends Expectation {
    val check = "max_distinct"
    val bound = cap
    private[DataContract] def metric = count_distinct(col(column))
  }

  /** (check_name, column_name, n_rows, metric, bound, pass) — one row
    * per expectation, ordered by (check_name, column_name). The suite is one
    * aggregate job; the verdict frame is assembled driver-side from
    * that single constant-size row.
    */
  def audit(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "audit: empty expectation suite")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = count(lit(1)).as("_n") +:
      expectations.zipWithIndex.map { case (e, i) => e.metric.cast("long").as(s"_m$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = row.getLong(0)
    expectations.zipWithIndex.map { case (e, i) =>
      val m = row.getLong(i + 1)
      (e.check, e.column, nRows, m, e.bound, m <= e.bound)
    }.toDF("check_name", "column_name", "n_rows", "metric", "bound", "pass")
      .orderBy(col("check_name"), col("column_name"))
  }
}
