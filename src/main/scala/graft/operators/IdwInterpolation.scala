package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverse-distance-weighted interpolation of station measurements onto
  * sample points (reference `src/preprocess.py:360-398`: weather IDW with
  * weight = 1/d²).
  *
  * One shuffle: groupBy(sampleId).sum over pre-multiplied columns — the
  * partial aggregation happens map-side, so the reduce only moves one row
  * per (sample, measurement-set).
  */
object IdwInterpolation {

  /** @param joined rows of (sampleId, distance_m, measurement columns);
    *               one row per (sample, station) candidate pair
    * @param valueCols measurement columns to interpolate
    * @param extraAggs additional aggregates computed in the SAME pass
    *                  (e.g. `count(lit(1)).as("n_stations")`) — folding
    *                  them here avoids a second scan of the candidate
    *                  join, which is the expensive subtree
    * @return one row per sampleId with IDW-averaged valueCols
    */
  def interpolate(joined: DataFrame, sampleId: String, distanceCol: String,
      valueCols: Seq[String], extraAggs: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    // weight 1/d^2, with d floored at 1m so an exactly-colocated station
    // doesn't produce an infinite weight
    val w = lit(1.0) / pow(greatest(col(distanceCol), lit(1.0)), 2)
    val weighted = joined.withColumn("_w", w)
    val aggs = valueCols.map { c =>
      // null-aware: a null measurement contributes neither value nor weight
      (sum(when(col(c).isNotNull, col("_w") * col(c))) /
        sum(when(col(c).isNotNull, col("_w")))).as(c)
    } ++ extraAggs
    weighted.groupBy(col(sampleId)).agg(aggs.head, aggs.tail: _*)
  }
}
