package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column row/null/distinct counts and
  * typed min/max — the data-quality snapshot every ingest pipeline
  * publishes next to the data (and diffs across snapshots to catch a
  * broken extractor, the relational sibling of
  * [[AnomalyDetection]]'s volume monitor).
  *
  * Scale shape (100 TB): ONE aggregate over the table computes every
  * column's metrics (min/max/null-count combine map-side; the exact
  * `count(distinct)`s expand the agg — swap `exact = false` to use
  * HLL `approx_count_distinct` at scale, same shape the warehouse
  * profilers ship). The unpivot to long format touches k rows, not
  * the data.
  */
object TableProfiler {

  /** Profile `cols` of `df`. Output: (column string, n_rows long,
    * n_null long, n_distinct long, min_s string, max_s string), one
    * row per column, in the given column order (ord int).
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { cn =>
      Seq(
        sum(when(col(cn).isNull, 1L).otherwise(0L)).as(s"${cn}__nn"),
        (if (exact) countDistinct(col(cn)) else approx_count_distinct(col(cn)))
          .as(s"${cn}__nd"),
        min(col(cn)).cast("string").as(s"${cn}__mn"),
        max(col(cn)).cast("string").as(s"${cn}__mx"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (cn, i) =>
      struct(lit(i + 1).as("ord"), lit(cn).as("column"), col("__n").as("n_rows"),
        col(s"${cn}__nn").as("n_null"), col(s"${cn}__nd").as("n_distinct"),
        col(s"${cn}__mn").as("min_s"), col(s"${cn}__mx").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
