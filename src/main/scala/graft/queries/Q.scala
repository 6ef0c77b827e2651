package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark program plus (when SQL-expressible) a
  * DuckDB oracle computing the same result on the same parquet tables.
  *
  * Contract (driver correctness gate): result column names must equal the
  * oracle's aliases; values are hash-compared after sorting columns by
  * name. So every computed column is explicitly aliased on BOTH sides,
  * floating aggregates are rounded identically on both sides, and rows
  * are deterministically ordered.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Shorthand for an oracle-checked query. */
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))

  /** Shorthand for a rows-only query (not SQL-expressible in DuckDB). */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
