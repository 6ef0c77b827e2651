package org.apache.spark.sql.graftbridge

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{CoalescedPartitionSpec, ShufflePartitionSpec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, ShufflePartitionsUtil, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ValidateRequirements}
import org.apache.spark.sql.internal.SQLConf

import graft.plans.{AsOfJoinExec, IntervalJoinExec}

/** AQE skew-splitting for the engine's native sort-merge joins — the
  * mirror of Spark's own `OptimizeSkewedJoin`, which pattern-matches
  * `SortMergeJoinExec`/`ShuffledHashJoinExec` by CLASS and therefore
  * can never rescue a custom exec. Injected via
  * `injectQueryStagePrepRule`, it runs in the exact slot where Spark
  * appends user prep rules: immediately after the builtin
  * `OptimizeSkewedJoin` inside `queryStagePreparationRules`, i.e. at
  * every AQE re-plan once the child shuffle stages have materialized
  * and runtime `MapOutputStatistics` exist.
  *
  * Mechanics (same algorithm, same conf knobs as the builtin rule):
  * a reducer partition is skewed when its byte size exceeds
  * `max(skewedPartitionThreshold, median × skewedPartitionFactor)`.
  * A skewed SPLITTABLE side's partition is split into map-range slices
  * of ~`targetSize` (`ShufflePartitionsUtil.createSkewPartitionSpecs` —
  * the granularity is map-output boundaries), and the OTHER side's
  * matching partition is duplicated once per slice, keeping the two
  * `AQEShuffleReadExec` spec lists pairwise-aligned for the exec's
  * partition zip. The `SortExec`s above the reads stay in place and
  * re-sort each slice, so the merge's (key, time) ordering contract
  * holds per slice.
  *
  * Which sides may split is where join SEMANTICS enter:
  *
  *  - [[AsOfJoinExec]] picks ONE best right row per left row, so the
  *    RIGHT side can never split (a per-slice "latest" is wrong — the
  *    true candidate may live in another slice); the LEFT side always
  *    can (each left row's answer depends only on the full right
  *    group, which slice-duplication preserves). This covers the
  *    canonical 100 TB skew case — a hot key on the EVENT side — while
  *    right-side (history) skew remains the bucketed rewrite's job
  *    ([[graft.operators.SkewAsOfJoin]], now an optimization rather
  *    than a correctness necessity).
  *  - [[IntervalJoinExec]] emits ALL matching pairs within a key:
  *    under INNER both sides may split (slice-of-left × slice-of-right
  *    is a disjoint cover of the pair space — the same argument as
  *    Spark's inner SMJ); under LEFT OUTER only the left (an unmatched
  *    left row would emit its null row once per right slice).
  *
  * After rewriting, the whole plan is re-validated with
  * `ValidateRequirements` — if relaxing the join's distribution broke a
  * requirement ABOVE it (an operator needing the join's clustering),
  * the rewrite is abandoned for that plan, exactly like the builtin
  * rule. Honors `spark.sql.adaptive.skewJoin.enabled`.
  *
  * Pinned in `AqeSkewJoinSpec`: a hot-key as-of/interval join splits
  * (exec carries `isSkewJoin=true`, left read has partial specs, more
  * tasks than `spark.sql.shuffle.partitions`) with results hash-equal
  * to the unsplit plan; a uniform corpus does not split.
  */
object OptimizeSkewedGraftJoin extends Rule[SparkPlan] {

  /** A materialized shuffle stage this rule may re-read: runtime map
    * stats exist, more than one reducer partition, and the exchange was
    * planted by EnsureRequirements (never a user repartition, whose
    * partition count is a user contract).
    */
  private object ShuffleStage {
    def unapply(plan: SparkPlan): Option[ShuffleQueryStageExec] = plan match {
      case s: ShuffleQueryStageExec
          if s.isMaterialized && s.mapStats.isDefined &&
            s.mapStats.get.bytesByPartitionId.length > 1 &&
            s.shuffle.shuffleOrigin == ENSURE_REQUIREMENTS =>
        Some(s)
      case _ => None
    }
  }

  private def medianSize(sizes: Array[Long]): Long =
    math.max(1L, sizes.sorted.apply(sizes.length / 2))

  private def skewThreshold(median: Long): Long =
    math.max(conf.getConf(SQLConf.SKEW_JOIN_SKEWED_PARTITION_THRESHOLD),
      (median * conf.getConf(SQLConf.SKEW_JOIN_SKEWED_PARTITION_FACTOR)).toLong)

  /** Per-slice target bytes: the advisory partition size, floored by the
    * average non-skewed partition (no point slicing finer than the
    * partitions that are not a problem) — Spark's own heuristic.
    */
  private def targetSize(sizes: Array[Long], thr: Long): Long = {
    val advisory = conf.getConf(SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    val nonSkew = sizes.filter(_ <= thr)
    if (nonSkew.isEmpty) advisory
    else math.max(advisory, nonSkew.sum / nonSkew.length)
  }

  /** Build pairwise-aligned spec lists splitting skewed partitions of
    * the splittable side(s); None when no partition actually split.
    */
  private def alignedSpecs(left: ShuffleQueryStageExec, right: ShuffleQueryStageExec,
      canSplitLeft: Boolean, canSplitRight: Boolean)
      : Option[(Seq[ShufflePartitionSpec], Seq[ShufflePartitionSpec])] = {
    val lSizes = left.mapStats.get.bytesByPartitionId
    val rSizes = right.mapStats.get.bytesByPartitionId
    if (lSizes.length != rSizes.length) return None
    val lThr = skewThreshold(medianSize(lSizes))
    val rThr = skewThreshold(medianSize(rSizes))
    val lTarget = targetSize(lSizes, lThr)
    val rTarget = targetSize(rSizes, rThr)
    val lOut = new ArrayBuffer[ShufflePartitionSpec]
    val rOut = new ArrayBuffer[ShufflePartitionSpec]
    var numSplit = 0
    var i = 0
    while (i < lSizes.length) {
      val lWhole: Seq[ShufflePartitionSpec] =
        CoalescedPartitionSpec(i, i + 1, lSizes(i)) :: Nil
      val rWhole: Seq[ShufflePartitionSpec] =
        CoalescedPartitionSpec(i, i + 1, rSizes(i)) :: Nil
      val lParts = if (canSplitLeft && lSizes(i) > lThr) {
        val specs = ShufflePartitionsUtil.createSkewPartitionSpecs(
          left.mapStats.get.shuffleId, i, lTarget)
        if (specs.isDefined) numSplit += 1
        specs.getOrElse(lWhole)
      } else lWhole
      val rParts = if (canSplitRight && rSizes(i) > rThr) {
        val specs = ShufflePartitionsUtil.createSkewPartitionSpecs(
          right.mapStats.get.shuffleId, i, rTarget)
        if (specs.isDefined) numSplit += 1
        specs.getOrElse(rWhole)
      } else rWhole
      // cross the slice lists pairwise: every left slice meets every
      // right slice of the SAME reducer partition, nothing else
      lParts.foreach { lp => rParts.foreach { rp => lOut += lp; rOut += rp } }
      i += 1
    }
    if (numSplit > 0) Some((lOut.toSeq, rOut.toSeq)) else None
  }

  private def optimize(plan: SparkPlan): SparkPlan = plan.transformUp {
    case j: AsOfJoinExec if !j.isSkewJoin =>
      (j.left, j.right) match {
        case (s1 @ SortExec(_, _, ShuffleStage(l), _), s2 @ SortExec(_, _, ShuffleStage(r), _)) =>
          // right never splits: as-of picks one best candidate per left
          // row — a per-slice best would be wrong (see class doc)
          alignedSpecs(l, r, canSplitLeft = true, canSplitRight = false).map {
            case (ls, rs) => j.copy(
              left = s1.copy(child = AQEShuffleReadExec(l, ls)),
              right = s2.copy(child = AQEShuffleReadExec(r, rs)),
              isSkewJoin = true)
          }.getOrElse(j)
        case _ => j
      }
    case j: IntervalJoinExec if !j.isSkewJoin =>
      (j.left, j.right) match {
        case (s1 @ SortExec(_, _, ShuffleStage(l), _), s2 @ SortExec(_, _, ShuffleStage(r), _)) =>
          alignedSpecs(l, r, canSplitLeft = true,
            canSplitRight = j.joinType == Inner).map {
            case (ls, rs) => j.copy(
              left = s1.copy(child = AQEShuffleReadExec(l, ls)),
              right = s2.copy(child = AQEShuffleReadExec(r, rs)),
              isSkewJoin = true)
          }.getOrElse(j)
        case _ => j
      }
  }

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!conf.getConf(SQLConf.SKEW_JOIN_ENABLED)) return plan
    val optimized = optimize(plan)
    if (optimized.fastEquals(plan) || ValidateRequirements.validate(optimized)) optimized
    else plan // relaxing the join's distribution broke an ancestor's need
  }
}

/** Test-facing descriptors for AQE shuffle reads — the spec lives in
  * package `graft` and cannot name the `private[sql]` spec classes.
  */
object GraftSkewProbe {
  /** (specCount, numPartialReducerSpecs) of the first AQEShuffleReadExec
    * under `plan`, descending through query stages.
    */
  def describeRead(plan: SparkPlan): Option[(Int, Int)] = plan match {
    case r: AQEShuffleReadExec =>
      Some((r.partitionSpecs.length,
        r.partitionSpecs.count(_.isInstanceOf[org.apache.spark.sql.execution.PartialReducerPartitionSpec])))
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => describeRead(s.plan)
    case other => other.children.iterator.flatMap(describeRead).nextOption()
  }
}
