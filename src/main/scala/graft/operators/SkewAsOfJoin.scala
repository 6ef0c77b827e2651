package graft.operators

import graft.plans.{AsOfDirection, NativeAsOfJoin}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.{JoinType, LeftOuter}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe as-of join: the hot-key mitigation for the native operator.
  * Since the AQE skew rule landed
  * ([[org.apache.spark.sql.graftbridge.OptimizeSkewedGraftJoin]] splits
  * a hot LEFT partition of [[graft.plans.AsOfJoinExec]] into map-range
  * slices at runtime), this rewrite is an OPTIMIZATION rather than a
  * correctness necessity for left-side skew; it remains the only
  * answer to RIGHT-side skew (a key with 10⁷ history rows — the AQE
  * rule can never split the right side, because as-of picks one best
  * candidate per left row), and it also helps when AQE is off or the
  * skew only materializes past the conf thresholds.
  *
  * Construction (semantics identical to `NativeAsOfJoin.asOf`, verified
  * against it per direction on a synthetic hot key in
  * `SkewAsOfJoinSpec` and against the independent DuckDB ASOF JOIN by
  * `q_join_asof_skewsafe`):
  *
  *  1. bucket both sides by `floor(time / bucketWidth)`;
  *  2. per (key, target bucket), compute carry-in rows — for Backward
  *     the LATEST right row of any STRICTLY earlier bucket, for Forward
  *     the EARLIEST right row of any strictly later bucket, for Nearest
  *     both (a running `last(..., ignoreNulls)` over the union of right
  *     rows and per-bucket markers, scan order ascending or descending
  *     so markers see exactly the other-bucket rows);
  *  3. as-of join on the COMPOSITE key (key, bucket): in-bucket
  *     candidates plus the carries are exactly the rows a left row in
  *     that bucket can match (backward carry rt < bucket·W <= leftTime
  *     and forward carry rt >= (bucket+1)·W > leftTime, so the carries
  *     need no extra time guard), and the join picks per its direction.
  *
  * Scale analysis: the per-partition work for the hottest (key, bucket)
  * group is O(left rows in that time bucket + right rows in it + 2) —
  * the operator converts an unbounded per-KEY straggler into a
  * per-(key × bucketWidth) bound the caller controls. Measured (round
  * 15, local[32], warm): 5M left rows with ONE key holding 4M of them ×
  * 50k right rows — plain sort-merge 2.8–3.6 s (one straggler partition
  * does 80% of the merge) vs bucketed 0.9–1.2 s (~3×); the ratio tracks
  * the hot key's share times the partition count at larger scales. The
  * carry window partitions by key over |right| + |distinct (key,
  * bucket)| rows: the skew assumption is that the HUGE side is the left
  * (events); a right side that is itself hot-keyed would move the
  * straggler there, not remove it.
  */
object SkewAsOfJoin {

  /** What [[asOfAuto]] decided, exposed for specs and pipeline audit
    * logs: the hot keys routed through the bucketed rewrite (empty →
    * everything took the plain native path), the derived bucket width,
    * and whether the broadcast short-circuit fired instead.
    */
  final case class AutoDecision(
      hotKeys: Seq[Any], bucketWidth: Option[Long], viaBroadcast: Boolean) {
    def usedBucketing: Boolean = hotKeys.nonEmpty
  }

  /** Skew-AWARE as-of join: closes the selection loop the way
    * `SaltedJoin.deriveSalts` does for equi-joins — the caller no
    * longer needs to know their key histogram. Decision ladder:
    *
    *  1. small right side (stats under
    *     `spark.sql.autoBroadcastJoinThreshold`, `allowBroadcast`) →
    *     plain [[NativeAsOfJoin.asOf]]: the strategy picks the
    *     broadcast exec, which has NO per-key straggler at all (left
    *     rows probe in place, nothing clusters by key);
    *  2. otherwise ONE map-side-combined aggregate over the left
    *     builds the per-key histogram (count + time span — the
    *     [[SkewDiagnostics.heavyHitters]] shape, plus the span the
    *     width derivation needs). Keys holding ≥ `hotShareThreshold`
    *     of all rows (capped at `maxHotKeys`, counted against a
    *     driver-scalar total) are HOT;
    *  3. no hot keys → plain native as-of (sort-merge — the uniform
    *     corpus needs no rewrite and the bucketing's carry pass would
    *     be pure overhead);
    *  4. hot keys → the left splits by `isin(hot)`: hot rows ride
    *     [[asOfBucketed]] with `bucketWidth` derived from the hottest
    *     keys' time spans (per hot key: span / ceil(cnt /
    *     targetRowsPerBucket); the MINIMUM across hot keys, so every
    *     hot key's densest bucket lands ≈ `targetRowsPerBucket`
    *     assuming time-uniform arrival), cold + null-key rows ride the
    *     plain native exec, and the two legs union.
    *
    * 100 TB cost accounting: the histogram is one extra pass over the
    * left — a map-side-combined (key → 3 longs) aggregate plus a
    * driver-scalar total and a top-k collect of ≤ `maxHotKeys` rows;
    * nothing key-ordered, nothing corpus-sized reaches the driver. The
    * split adds one `isin` filter per side (pushed to the scans).
    * Semantics are direction/tolerance/joinType-identical to
    * [[NativeAsOfJoin.asOf]] — pinned by `SkewAsOfJoinSpec`
    * differentials and the independent DuckDB ASOF oracle
    * (`q_join_asof_auto`).
    */
  def asOfAuto(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String],
      joinType: JoinType = LeftOuter, within: Option[Long] = None,
      direction: AsOfDirection = AsOfDirection.Backward,
      hotShareThreshold: Double = 0.1, targetRowsPerBucket: Long = 1000000L,
      maxHotKeys: Int = 32, allowBroadcast: Boolean = true): DataFrame =
    asOfAutoWithDecision(left, right, key, leftTime, rightTime, payloadCols,
      joinType, within, direction, hotShareThreshold, targetRowsPerBucket,
      maxHotKeys, allowBroadcast)._1

  /** [[asOfAuto]] plus the [[AutoDecision]] it took. */
  def asOfAutoWithDecision(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String],
      joinType: JoinType = LeftOuter, within: Option[Long] = None,
      direction: AsOfDirection = AsOfDirection.Backward,
      hotShareThreshold: Double = 0.1, targetRowsPerBucket: Long = 1000000L,
      maxHotKeys: Int = 32, allowBroadcast: Boolean = true)
      : (DataFrame, AutoDecision) = {
    require(targetRowsPerBucket > 0,
      s"asOfAuto: targetRowsPerBucket must be > 0, got $targetRowsPerBucket")
    def plain = NativeAsOfJoin.asOf(left, right, key, leftTime, rightTime,
      payloadCols, joinType, within, direction)

    // ladder rung 1: a broadcast-able right side has no skew problem —
    // same stats test AsOfJoinStrategy applies
    val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    val rightSmall = thr > 0 &&
      right.queryExecution.optimizedPlan.stats.sizeInBytes <= thr
    if (allowBroadcast && rightSmall)
      return (plain, AutoDecision(Nil, None, viaBroadcast = true))

    // rung 2: ONE aggregate pass over the left — per-key count + time
    // span + grand total in a single job (SkewSupport.hotKeyHistogram,
    // shared with the interval operator so the selection semantics
    // cannot drift between the two)
    val (hot, _) = SkewSupport.hotKeyHistogram(left, key, leftTime,
      hotShareThreshold, maxHotKeys, "asOfAuto")

    // rung 3: uniform corpus — no key dominates; the plain operator's
    // one-shuffle-per-side plan is already the right one
    if (hot.isEmpty) return (plain, AutoDecision(Nil, None, viaBroadcast = false))

    // rung 4: derive the width from the hot keys themselves — min
    // across hot keys of span / ceil(cnt / target) keeps EVERY hot
    // key's expected bucket at ≈ targetRowsPerBucket
    val width = SkewSupport.densityWidth(hot, targetRowsPerBucket)
    val hotVals = hot.map(_.get(0)).toSeq
    val hotLeft = left.filter(col(key).isin(hotVals: _*))
    val coldLeft = left.filter(col(key).isNull || !col(key).isin(hotVals: _*))
    // right null keys match nothing under any path, so dropping them on
    // the cold leg preserves semantics
    val hotRight = right.filter(col(key).isin(hotVals: _*))
    val coldRight = right.filter(!col(key).isin(hotVals: _*))
    val joined = asOfBucketed(hotLeft, hotRight, key, leftTime, rightTime,
        payloadCols, bucketWidth = width, joinType, within, direction)
      .unionByName(NativeAsOfJoin.asOf(coldLeft, coldRight, key, leftTime,
        rightTime, payloadCols, joinType, within, direction))
    (joined, AutoDecision(hotVals, Some(width), viaBroadcast = false))
  }

  private def floorDivCol(t: Column, w: Long): Column =
    SkewSupport.floorDivCol(t, w)

  /** As-of join `left` to `right` on `key` with per-time-bucket skew
    * splitting; all three directions and `within` supported — pandas
    * `merge_asof` semantics, same contracts as [[NativeAsOfJoin.asOf]].
    * Time columns must be int/long/timestamp; `bucketWidth` is in the
    * column's own units (micros for timestamps).
    */
  def asOfBucketed(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String],
      bucketWidth: Long,
      joinType: JoinType = LeftOuter, within: Option[Long] = None,
      direction: AsOfDirection = AsOfDirection.Backward): DataFrame = {
    require(bucketWidth > 0, s"asOfBucketed: bucketWidth must be > 0, got $bucketWidth")
    // fail by name, not with a downstream duplicate-column analysis
    // error: a key in the payload would ride the carrier struct AND the
    // group key into the unionByName selects (and NativeAsOfJoin would
    // reject it anyway — it collides with the left's key column)
    require(!payloadCols.contains(key),
      s"asOfBucketed: payload column $key is the join key — it is already on " +
        "every left row; drop it from payloadCols")
    val reserved = Seq("__graft_bucket", "__graft_tag", "__graft_carrier")
    reserved.foreach { n =>
      require(!left.columns.contains(n) && !right.columns.contains(n),
        s"asOfBucketed: column name $n is reserved")
    }

    def asLong(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      SkewSupport.asLong(c, dt, "asOfBucketed")
    val lDt = left.schema(leftTime).dataType
    val rDt = right.schema(rightTime).dataType

    val leftB = left.withColumn("__graft_bucket",
      floorDivCol(asLong(col(leftTime), lDt), bucketWidth))
    val rightB = right
      .select((Seq(key, rightTime) ++ payloadCols).distinct.map(col): _*)
      .withColumn("__graft_bucket",
        floorDivCol(asLong(col(rightTime), rDt), bucketWidth))

    val carrierFields = Seq(rightTime) ++ payloadCols.filterNot(_ == rightTime)
    val targets = leftB
      .filter(col(key).isNotNull && col("__graft_bucket").isNotNull)
      .select(col(key), col("__graft_bucket")).distinct()
    val rights = rightB
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .withColumn("__graft_tag", lit(1))
      .withColumn("__graft_carrier", struct(carrierFields.map(col): _*))
      .select(col(key), col("__graft_bucket"), col("__graft_tag"), col("__graft_carrier"))
    val carrierType = rights.schema("__graft_carrier").dataType
    val marks = targets
      .withColumn("__graft_tag", lit(0))
      .withColumn("__graft_carrier", lit(null).cast(carrierType))
      .select(col(key), col("__graft_bucket"), col("__graft_tag"), col("__graft_carrier"))
    val unioned = rights.unionByName(marks)

    /** Carry rows per (key, target bucket): markers (tag 0) sort before
      * the same bucket's right rows in BOTH scan orders, so the running
      * last(...) at a marker has seen exactly the other-bucket rows —
      * strictly earlier buckets under the ascending scan (backward
      * carry: latest right row before the bucket), strictly later under
      * the descending scan with rt descending (forward carry: earliest
      * right row after it).
      */
    def carriesFor(dir: AsOfDirection): DataFrame = {
      val rtInCarrier = col("__graft_carrier").getField(rightTime)
      val w = (dir match {
        case AsOfDirection.Backward => Window.partitionBy(col(key))
          .orderBy(col("__graft_bucket").asc, col("__graft_tag").asc, rtInCarrier.asc_nulls_first)
        case AsOfDirection.Forward => Window.partitionBy(col(key))
          .orderBy(col("__graft_bucket").desc, col("__graft_tag").asc, rtInCarrier.desc_nulls_first)
        case AsOfDirection.Nearest => throw new IllegalStateException("per-side only")
      }).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      unioned
        .withColumn("__graft_carrier", last(col("__graft_carrier"), ignoreNulls = true).over(w))
        .filter(col("__graft_tag") === 0 && col("__graft_carrier").isNotNull)
        .select(Seq(col(key), col("__graft_bucket")) ++
          carrierFields.map(n => col("__graft_carrier").getField(n).as(n)): _*)
    }

    val carries = direction match {
      case AsOfDirection.Backward => carriesFor(AsOfDirection.Backward)
      case AsOfDirection.Forward => carriesFor(AsOfDirection.Forward)
      case AsOfDirection.Nearest =>
        carriesFor(AsOfDirection.Backward).unionByName(carriesFor(AsOfDirection.Forward))
    }

    val augmented = rightB
      .select(Seq(col(key), col("__graft_bucket")) ++ carrierFields.map(col): _*)
      .unionByName(carries)

    NativeAsOfJoin.asOfKeys(leftB, augmented, keys = Seq(key, "__graft_bucket"),
        leftTime = leftTime, rightTime = rightTime,
        payloadCols = payloadCols, // augmented carries rightTime, so a
        joinType = joinType,       // rightTime-in-payload request (same
        within = within,           // contract as NativeAsOfJoin) resolves
        direction = direction)
      .drop("__graft_bucket")
  }
}
