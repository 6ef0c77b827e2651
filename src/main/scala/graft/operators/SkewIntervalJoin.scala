package graft.operators

import graft.plans.NativeIntervalJoin
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType}
import org.apache.spark.sql.functions._

/** Skew-safe keyed interval-containment join — the hot-key mitigation
  * for [[graft.plans.IntervalJoinExec]], completing the symmetry with
  * the as-of family ([[SkewAsOfJoin]]): the native sort-merge exec
  * clusters both sides by key, so one key holding 10⁷ points lands in
  * ONE partition of the merge, and the zip contract forbids AQE skew
  * splitting from rescuing it.
  *
  * Construction (semantics identical to [[NativeIntervalJoin.contain]],
  * verified per joinType against it on a synthetic hot corpus in
  * `SkewIntervalJoinSpec` and against an independent DuckDB range join
  * by `q_join_interval_skewsafe` / `q_join_interval_auto`):
  *
  *  1. each point gets `bucket = floor(t / bucketWidth)` — every point
  *     lives in EXACTLY ONE bucket;
  *  2. each interval replicates to every bucket it overlaps
  *     (`sequence(floor(start/W), floor(end/W))` + explode — bounded
  *     by `ceil(span / W) + 1` replicas per interval);
  *  3. the native join runs on the COMPOSITE key (key, bucket): a
  *     point's candidate intervals are exactly the replicas in its
  *     bucket, the exec's own `start <= t <= end` check drops
  *     non-containing replicas, and since the point is in one bucket
  *     only, no interval can match it twice — output multiset is
  *     EXACTLY the plain join's, for Inner and LeftOuter alike (a
  *     LeftOuter point is unmatched iff no interval overlaps its
  *     bucket and contains it — i.e. iff no interval contains it).
  *
  * Scale analysis: per-partition work for the hottest (key, bucket)
  * group is O(points in that time bucket + intervals overlapping it) —
  * the per-KEY straggler becomes a per-(key × bucketWidth) bound the
  * caller controls. The price (which the as-of rewrite's carry trick
  * avoids but a 1:N containment cannot) is interval replication:
  * `ceil(span/W) + 1` rows per interval, so W should be at least the
  * TYPICAL interval span (then replication ≤ ~2×) — [[containAuto]]
  * derives exactly that. A replication bomb (one interval spanning the
  * whole corpus at a tiny W) fails fast: any interval wider than
  * `maxReplication` buckets raises with the offending span in the
  * message rather than silently exploding the shuffle.
  */
object SkewIntervalJoin {

  /** What [[containAuto]] decided, exposed for specs and pipeline audit
    * logs — same shape as [[SkewAsOfJoin.AutoDecision]].
    */
  final case class AutoDecision(
      hotKeys: Seq[Any], bucketWidth: Option[Long], viaBroadcast: Boolean) {
    def usedBucketing: Boolean = hotKeys.nonEmpty
  }

  /** Skew-AWARE interval join: the caller no longer needs to know their
    * key histogram OR their interval spans. Decision ladder (the
    * [[SkewAsOfJoin.asOfAuto]] ladder, plus one interval-side rung):
    *
    *  1. small interval side (stats under
    *     `spark.sql.autoBroadcastJoinThreshold`, `allowBroadcast`) →
    *     plain [[NativeIntervalJoin.contain]]: the strategy picks the
    *     broadcast exec, which has NO per-key straggler (points probe
    *     in place, nothing clusters by key);
    *  2. ONE map-side-combined rollup over the points builds the
    *     per-key histogram (count + time span) AND the grand total in
    *     a single job; keys holding ≥ `hotShareThreshold` of all rows
    *     (≤ `maxHotKeys`) are HOT;
    *  3. no hot keys → plain native contain (sort-merge);
    *  4. hot keys → width = max(point-density width: min over hot keys
    *     of span / ceil(cnt / targetRowsPerBucket); TYPICAL hot
    *     interval span: the mean span of hot-key intervals, one
    *     map-side-combined aggregate over the `isin(hot)`-pruned
    *     interval side) — the first term bounds points per bucket, the
    *     second caps replication at ~2× for the typical interval. Hot
    *     rows ride [[containBucketed]], cold + null-key rows ride the
    *     plain native exec, the legs union (the legs partition points
    *     by KEY, so LeftOuter stays exact per leg).
    *
    * 100 TB cost accounting: one histogram pass over the points
    * (key → 3 longs, map-side combined, top-k of ≤ maxHotKeys+1 rows
    * to the driver), one 2-long aggregate over the hot-key slice of
    * the intervals, one `isin` filter per side (pushed to the scans).
    */
  def containAuto(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: String, startCol: String, endCol: String,
      payloadCols: Seq[String], joinType: JoinType = Inner,
      hotShareThreshold: Double = 0.1, targetRowsPerBucket: Long = 1000000L,
      maxHotKeys: Int = 32, maxReplication: Int = 4096,
      allowBroadcast: Boolean = true): DataFrame =
    containAutoWithDecision(points, intervals, key, pointTime, startCol, endCol,
      payloadCols, joinType, hotShareThreshold, targetRowsPerBucket,
      maxHotKeys, maxReplication, allowBroadcast)._1

  /** [[containAuto]] plus the [[AutoDecision]] it took. */
  def containAutoWithDecision(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: String, startCol: String, endCol: String,
      payloadCols: Seq[String], joinType: JoinType = Inner,
      hotShareThreshold: Double = 0.1, targetRowsPerBucket: Long = 1000000L,
      maxHotKeys: Int = 32, maxReplication: Int = 4096,
      allowBroadcast: Boolean = true): (DataFrame, AutoDecision) = {
    require(targetRowsPerBucket > 0,
      s"containAuto: targetRowsPerBucket must be > 0, got $targetRowsPerBucket")
    def plain = NativeIntervalJoin.contain(points, intervals, key, pointTime,
      startCol, endCol, payloadCols, joinType)

    // rung 1: a broadcast-able interval side has no skew problem — same
    // stats test IntervalJoinStrategy applies
    val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    val rightSmall = thr > 0 &&
      intervals.queryExecution.optimizedPlan.stats.sizeInBytes <= thr
    if (allowBroadcast && rightSmall)
      return (plain, AutoDecision(Nil, None, viaBroadcast = true))

    // rung 2: per-key count + time span + grand total in a single job
    // (SkewSupport.hotKeyHistogram — shared with the as-of operator so
    // the selection semantics cannot drift between the two)
    val (hot, _) = SkewSupport.hotKeyHistogram(points, key, pointTime,
      hotShareThreshold, maxHotKeys, "containAuto")

    // rung 3: uniform corpus — no key dominates
    if (hot.isEmpty) return (plain, AutoDecision(Nil, None, viaBroadcast = false))

    // rung 4: point-density width, clamped UP to the typical hot
    // interval span so the replication factor for the typical interval
    // stays ≤ ~2 (the knob the as-of rewrite does not need)
    val densityWidth = SkewSupport.densityWidth(hot, targetRowsPerBucket)
    val hotVals = hot.map(_.get(0)).toSeq
    val sDt = intervals.schema(startCol).dataType
    val spanRow = intervals
      .filter(col(key).isin(hotVals: _*) &&
        col(startCol).isNotNull && col(endCol).isNotNull &&
        // inverted intervals (s > e) never replicate in containBucketed —
        // letting their negative spans into the mean would shrink the
        // derived width below the real typical span and inflate
        // replication for the intervals that DO
        col(startCol) <= col(endCol))
      .agg(avg(asLong(col(endCol), sDt, "containAuto") -
        asLong(col(startCol), sDt, "containAuto")).as("__span"))
      .collect()(0)
    val typicalSpan = if (spanRow.isNullAt(0)) 0L else math.ceil(spanRow.getDouble(0)).toLong
    val width = densityWidth.max(typicalSpan).max(1L)

    val hotPoints = points.filter(col(key).isin(hotVals: _*))
    val coldPoints = points.filter(col(key).isNull || !col(key).isin(hotVals: _*))
    // interval-side null keys match nothing under either path
    val hotIntervals = intervals.filter(col(key).isin(hotVals: _*))
    val coldIntervals = intervals.filter(!col(key).isin(hotVals: _*))
    val joined = containBucketed(hotPoints, hotIntervals, key, pointTime,
        startCol, endCol, payloadCols, bucketWidth = width, joinType, maxReplication)
      .unionByName(NativeIntervalJoin.contain(coldPoints, coldIntervals, key,
        pointTime, startCol, endCol, payloadCols, joinType))
    (joined, AutoDecision(hotVals, Some(width), viaBroadcast = false))
  }

  /** Interval-containment join with per-time-bucket skew splitting —
    * same contracts as [[NativeIntervalJoin.contain]] (Inner or
    * LeftOuter; null key/time/bounds match nothing; payload names must
    * not collide with point columns). Time columns must be
    * int/long/timestamp; `bucketWidth` is in the column's own units
    * (micros for timestamps). Any interval spanning more than
    * `maxReplication` buckets raises at run time (replication-bomb
    * guard) — widen `bucketWidth` or raise the cap.
    */
  def containBucketed(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: String, startCol: String, endCol: String,
      payloadCols: Seq[String], bucketWidth: Long,
      joinType: JoinType = Inner, maxReplication: Int = 4096): DataFrame = {
    require(bucketWidth > 0,
      s"containBucketed: bucketWidth must be > 0, got $bucketWidth")
    require(maxReplication > 0,
      s"containBucketed: maxReplication must be > 0, got $maxReplication")
    require(!payloadCols.contains(key),
      s"containBucketed: payload column $key is the join key — it is already on " +
        "every point row; drop it from payloadCols")
    require(!points.columns.contains("__graft_bucket") &&
      !intervals.columns.contains("__graft_bucket"),
      "containBucketed: column name __graft_bucket is reserved")

    val lDt = points.schema(pointTime).dataType
    val sDt = intervals.schema(startCol).dataType

    // a null time yields a null bucket; null in any composite key column
    // matches nothing in the native exec, and LeftOuter still keeps the
    // point row — exactly the plain operator's null semantics
    val pointsB = points.withColumn("__graft_bucket",
      floorDivCol(asLong(col(pointTime), lDt, "containBucketed"), bucketWidth))

    val s = asLong(col(startCol), sDt, "containBucketed")
    val e = asLong(col(endCol), sDt, "containBucketed")
    val bs = floorDivCol(s, bucketWidth)
    val be = floorDivCol(e, bucketWidth)
    val buckets = when(be - bs >= lit(maxReplication.toLong), raise_error(
        format_string("containBucketed: an interval spans %d buckets at width " +
          s"$bucketWidth (cap $maxReplication) — widen bucketWidth or raise " +
          "maxReplication", be - bs + 1)))
      .otherwise(sequence(bs, be))
    val intervalsB = intervals
      .select((Seq(key, startCol, endCol) ++ payloadCols).distinct.map(col): _*)
      .filter(col(key).isNotNull && s.isNotNull && e.isNotNull && s <= e)
      .withColumn("__graft_bucket", explode(buckets))

    NativeIntervalJoin.containKeys(pointsB, intervalsB,
        keys = Seq(key, "__graft_bucket"), pointTime = pointTime,
        startCol = startCol, endCol = endCol, payloadCols = payloadCols,
        joinType = joinType)
      .drop("__graft_bucket")
  }

  private def floorDivCol(t: Column, w: Long): Column =
    SkewSupport.floorDivCol(t, w)

  private def asLong(c: Column, dt: org.apache.spark.sql.types.DataType,
      who: String): Column = SkewSupport.asLong(c, dt, who)
}
