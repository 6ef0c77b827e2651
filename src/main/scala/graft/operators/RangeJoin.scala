package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — another operator Spark plans as a
  * BroadcastNestedLoop/cartesian when written naively (`p BETWEEN lo
  * AND hi` has no equi-key). Here each interval explodes to the
  * fixed-width buckets it overlaps and points equi-join their own
  * bucket, after which the exact BETWEEN predicate filters: cost is
  * |points| + Σ(interval_len / bucketWidth) candidates instead of
  * |points| × |intervals|. A point lives in exactly one bucket, so each
  * qualifying (point, interval) pair is produced exactly once — no
  * dedup pass. Pick `bucketWidth` near the median interval length:
  * wider buckets explode fewer interval copies but admit more
  * false-candidate points per bucket.
  *
  * Domain: non-negative point/bound values (integer division as floor).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucket(c: org.apache.spark.sql.Column) = (c / bucketWidth).cast("long")
    val iv = intervals.withColumn("_b",
      explode(sequence(bucket(col(loCol)), bucket(col(hiCol)))))
    points.withColumn("_b", bucket(col(pointCol)))
      .join(iv, "_b")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_b")
  }
}
