package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval overlap join: all pairs (l, r) whose time intervals
  * intersect (`l.start <= r.end AND r.start <= l.end`) — the temporal
  * join behind "which incidents overlapped which deploy windows",
  * ad-exposure attribution, and maintenance-window conflict checks.
  *
  * 100 TB design: the naive plan is a cartesian with a range predicate
  * (Catalyst has no interval-equality to hash on), which is a non-starter
  * at scale. Here each interval is exploded to the fixed-width time
  * buckets it covers, the join becomes an EQUI-join on the bucket id
  * (hash-partitioned, AQE-skew-splittable) with the overlap predicate as
  * a post-filter, and each qualifying pair is emitted exactly once — at
  * the bucket containing the LATER of the two starts, which both sides
  * provably cover (overlap means the later start lies inside the other
  * interval). Work is O(total bucket spans + true pairs), never O(n·m).
  * Pick `bucketUs` near the typical interval length: too small multiplies
  * the explode factor, too large turns buckets into mini-cartesians. A
  * hot bucket (everyone's interval covers Black Friday) is a salting
  * candidate — split the bucket id and replicate the shorter side.
  */
object IntervalJoin {

  /** Exact floor division on (possibly negative) microsecond epochs —
    * `div` truncates toward zero, which would straddle 1970 with a
    * double-width bucket and disagree with floor-dividing engines.
    */
  private def bucketOf(c: Column, bucketUs: Long): Column =
    (c - pmod(c, lit(bucketUs))) / bucketUs

  /** Joins `left` and `right` on interval overlap. Column names across
    * the two inputs must be disjoint; starts/ends are epoch microseconds
    * (longs) and intervals are closed, with `start <= end` required
    * (rows violating it are dropped, matching the SQL overlap predicate
    * which can never fire for an empty closed interval on both ends).
    */
  def overlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketUs: Long = 3600L * 1000000L): DataFrame = {
    require(bucketUs > 0, s"bucketUs=$bucketUs must be positive")
    def exploded(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(s) <= col(e))
        .withColumn("bucket",
          explode(sequence(bucketOf(col(s), bucketUs).cast("long"),
            bucketOf(col(e), bucketUs).cast("long"))))
    val l = exploded(left, lStart, lEnd)
    val r = exploded(right, rStart, rEnd)
    l.join(r, Seq("bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // Dedup without a distinct-shuffle: the pair survives only in the
      // bucket where the later interval starts.
      .filter(col("bucket") ===
        bucketOf(greatest(col(lStart), col(rStart)), bucketUs).cast("long"))
      .drop("bucket")
  }
}
