package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Ascending, Attribute, GenericInternalRow, JoinedRow,
  PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode,
  Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Native keyed interval-containment join — the 1:N sibling of
  * [[NativeAsOfJoin]] on the same whole-operator ladder: a first-class
  * [[IntervalJoinNode]] logical plan, planned by
  * [[IntervalJoinStrategy]] into [[IntervalJoinExec]], a streaming
  * sort-merge physical operator.
  *
  * Semantics: for each left (point) row, one output row per right
  * interval of the same key with `start <= t <= end` (closed ends).
  * `joinType` [[Inner]] (default) drops uncontained points;
  * [[LeftOuter]] keeps them with null payload columns — the audit
  * shape ("which clicks fell outside every campaign window"). SQL-null
  * semantics: a null key, time, start, or end never matches. Asserted row-for-row against the equivalent relational
  * range join and a DuckDB oracle in `NativeIntervalJoinSpec` /
  * `q_join_interval_native`.
  *
  * 100 TB design: both children cluster on their key and sort by
  * (key, time) / (key, start) — Catalyst's EnsureRequirements plans
  * exactly ONE hash shuffle + sort per side. The merge streams both
  * sides once per partition holding only the ACTIVE intervals of the
  * current key (those already started, not yet expired): O(|L|+|R| +
  * output) time, memory bounded by per-key interval concurrency —
  * never the interval history. A range-bucketed equi-join (the
  * compositional [[graft.operators.IntervalJoin]]) pays the explode
  * factor × bucket-width tuning; this pays neither.
  */
case class IntervalJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightStart: Attribute, rightEnd: Attribute,
    payload: Seq[Attribute],
    joinType: JoinType = Inner,
    broadcast: Option[Boolean] = None) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    s"IntervalJoinNode: need >= 1 key and equal key counts, " +
      s"got ${leftKeys.length} vs ${rightKeys.length}")
  require(joinType == Inner || joinType == LeftOuter,
    s"IntervalJoinNode: joinType must be INNER or LEFT OUTER, got $joinType")

  override def output: Seq[Attribute] =
    if (joinType == LeftOuter) left.output ++ payload.map(_.withNullability(true))
    else left.output ++ payload

  /** Stats propagation — same rationale as [[AsOfJoinNode.stats]]: the
    * visitor default for an unknown BinaryNode is the PRODUCT of child
    * sizes, which starves every operator above of usable estimates.
    * This join is 1:N (a point can land in several intervals), so a
    * plain left-row-count forward would be a LOWER bound — and an
    * UNDER-estimate is the UNSAFE direction here: it makes joins above
    * more likely to broadcast the interval-join output (potential
    * executor OOM when points match many intervals). Scale by a small
    * fan-out factor so upstream broadcast decisions err conservative;
    * still orders of magnitude closer than the product default.
    */
  override def stats: org.apache.spark.sql.catalyst.plans.logical.Statistics = {
    val l = left.stats
    val lWidth = BigInt((1 max left.output.map(_.dataType.defaultSize).sum).toLong)
    val outWidth = lWidth + payload.map(_.dataType.defaultSize).sum
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = (l.sizeInBytes * outWidth * IntervalJoinNode.statsFanOut / lWidth).max(1),
      rowCount = l.rowCount.map(_ * IntervalJoinNode.statsFanOut))
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinNode =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinNode {
  /** Assumed average intervals-per-point for stats when no real
    * concurrency estimate exists: biases upstream broadcast decisions
    * conservative (never makes a plan wrong, only less eager to
    * broadcast a 1:N output).
    */
  val statsFanOut = 4
}

/** Plans [[IntervalJoinNode]] as [[IntervalJoinExec]] (sort-merge,
  * big×big) or [[BroadcastIntervalJoinExec]] (small interval side) —
  * same selection rule as [[AsOfJoinStrategy]]: the node's `broadcast`
  * knob when set, else right-child stats vs
  * `spark.sql.autoBroadcastJoinThreshold`.
  */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: IntervalJoinNode =>
      val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val autoSmall = thr > 0 && n.right.stats.sizeInBytes <= thr
      if (n.broadcast.getOrElse(autoSmall))
        BroadcastIntervalJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightStart,
          n.rightEnd, n.payload, n.joinType, planLater(n.left), planLater(n.right)) :: Nil
      else
        IntervalJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightStart,
          n.rightEnd, n.payload, n.joinType, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: the join is INNER, so single-side deterministic
  * predicates move below it on BOTH sides (left-only → left child,
  * right-only → right child), where the builtin rules carry them into
  * the scans — the pushdown Catalyst cannot do through a black-box
  * node. Mixed predicates stay above.
  */
object PushFiltersThroughIntervalJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: IntervalJoinNode) =>
      val preds = splitConjunctivePredicates(cond)
      val (lPush, rest) = preds.partition(p =>
        p.deterministic && p.references.subsetOf(j.left.outputSet))
      // a right-side predicate above a LEFT OUTER interval join filters
      // post-match payload values — sinking it would turn unmatched
      // nulls into dropped rows; only INNER may push right-side
      val (rPush, keep) = rest.partition(p =>
        j.joinType == Inner &&
        p.deterministic && p.references.subsetOf(j.right.outputSet))
      if (lPush.isEmpty && rPush.isEmpty) f
      else {
        val newLeft = lPush.reduceOption(And).map(Filter(_, j.left)).getOrElse(j.left)
        val newRight = rPush.reduceOption(And).map(Filter(_, j.right)).getOrElse(j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Streaming sort-merge interval join: children arrive clustered by key
  * and sorted by (key, time) / (key, start); each partition is merged
  * in one pass over an active-interval buffer.
  *
  * Codegen audit (round 14): interpreted row-at-a-time (codegen'd
  * UnsafeProjections inside), measured 0.57-0.8 s at sf0.1×10 (1M
  * events) — unlike the as-of case there is no cheaper compositional
  * equivalent to fall back to (a range-predicate join explodes on
  * bucket overlap), so the interpretive overhead is the price of the
  * O(|L|+|R|) guarantee; accepted, same reasoning as [[AsOfJoinExec]].
  */
case class IntervalJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightStart: Attribute, rightEnd: Attribute,
    payload: Seq[Attribute], joinType: JoinType,
    left: SparkPlan, right: SparkPlan,
    isSkewJoin: Boolean = false) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    if (joinType == LeftOuter) left.output ++ payload.map(_.withNullability(true))
    else left.output ++ payload

  // isSkewJoin: OptimizeSkewedGraftJoin has re-arranged the shuffle
  // reads into aligned slice pairs (INNER may split both sides — the
  // all-pairs-within-key semantics make slice×slice a disjoint cover;
  // LEFT OUTER splits only the left); the children no longer satisfy
  // ClusteredDistribution and must not be re-exchanged — the same
  // contract as SortMergeJoinExec(isSkewJoin = true).
  override def requiredChildDistribution: Seq[Distribution] =
    if (isSkewJoin) UnspecifiedDistribution :: UnspecifiedDistribution :: Nil
    else ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightStart, Ascending))

  override def outputPartitioning: Partitioning =
    if (isSkewJoin)
      org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(
        left.outputPartitioning.numPartitions)
    else left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def nodeName: String =
    if (isSkewJoin) super.nodeName + "(skew=true)" else super.nodeName

  // UI visibility at scale — every builtin join reports row counts;
  // this exec must not be the one dark node (reference: SortMergeJoinExec)
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedPoints" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of points inside >= 1 interval"),
    "numUnmatchedPoints" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of points inside no interval"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lks, rks, lt, rs, re, pay) =
      (leftKeys, rightKeys, leftTime, rightStart, rightEnd, payload)
    val outer = joinType == LeftOuter
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatchedPoints")
    val numUnmatched = longMetric("numUnmatchedPoints")
    // Pairwise partition zip — alignment is the framework's guarantee
    // (EnsureRequirements + ValidateRequirements + the pairwise-aligned
    // specs OptimizeSkewedGraftJoin constructs); zipPartitions itself
    // rejects unequal partition counts. Same rationale as AsOfJoinExec.
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lks, leftOut)
      val rKeyProj = UnsafeProjection.create(rks, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rStartProj = UnsafeProjection.create(Seq(rs), rightOut)
      val rEndProj = UnsafeProjection.create(Seq(re), rightOut)
      val payloadProj = UnsafeProjection.create(pay, rightOut)
      // bind against NULLABLE payload attrs: unmatched OUTER points read
      // the all-null payload row (same rule as AsOfJoinExec)
      val resultProj =
        UnsafeProjection.create(outAttrs, leftOut ++ pay.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(pay.length)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lks.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // Active intervals of the CURRENT key: started (start <= t seen),
      // not yet known-expired. Each entry: (end row, payload row), both
      // copied. currentKey is the key the buffer belongs to.
      var currentKey: UnsafeRow = null
      val active = new ArrayBuffer[(UnsafeRow, UnsafeRow)]
      lIter.flatMap { lRow =>
        val lKeyRow = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        if (lKeyRow.anyNull || lTimeRow.isNullAt(0)) {
          numUnmatched += 1
          if (outer) {
            numOutputRows += 1
            Iterator.single(resultProj(joined(lRow, nullPayload)))
          } else Iterator.empty
        } else {
          if (currentKey == null || keyOrd.compare(currentKey, lKeyRow) != 0) {
            active.clear()
            currentKey = lKeyRow.copy()
          }
          // admit right rows: key < lKey (skip), or key == lKey with
          // start <= t (buffer); stop at a future start or key.
          var done = false
          while (!done && rBuf.hasNext) {
            val head = rBuf.head
            val rKeyRow = rKeyProj(head)
            if (rKeyRow.anyNull) rBuf.next() // null keys match nothing
            else {
              val c = keyOrd.compare(rKeyRow, lKeyRow)
              if (c < 0) rBuf.next() // key group already passed
              else if (c == 0) {
                val startRow = rStartProj(head)
                if (startRow.isNullAt(0)) rBuf.next() // nulls-first: skip
                else if (timeOrd.compare(startRow, lTimeRow) <= 0) {
                  val endRow = rEndProj(head)
                  if (!endRow.isNullAt(0)) // null end never matches
                    active += ((endRow.copy(), payloadProj(head).copy()))
                  rBuf.next()
                } else done = true // future interval — stop
              } else done = true // right is ahead of this key group
            }
          }
          // purge expired (end < t — can never match this or later rows)
          var i = 0
          while (i < active.length) {
            if (timeOrd.compare(active(i)._1, lTimeRow) < 0) active.remove(i)
            else i += 1
          }
          // Every survivor has start <= t <= end: emit one row each.
          // Snapshot the buffer (it mutates on the next left row) and
          // keep the PROJECTION lazy — resultProj reuses one output
          // buffer, so eagerly materializing N results would alias
          // them all to the last match.
          if (active.isEmpty) {
            numUnmatched += 1
            if (outer) {
              numOutputRows += 1
              Iterator.single(resultProj(joined(lRow, nullPayload)))
            } else Iterator.empty
          } else {
            numMatched += 1
            numOutputRows += active.length
            val lCopy = lRow.copy()
            val snapshot = active.map(_._2).toArray
            snapshot.iterator.map(payRow => resultProj(joined(lCopy, payRow)))
          }
        }
      }
    }
  }
}

/** Broadcast-right interval-containment join — the small interval side
  * (campaign windows, maintenance windows, session bounds) ships to
  * every executor as a per-key START-SORTED index; each left point
  * binary-searches the last interval with `start <= t` and scans the
  * prefix filtering `end >= t`. ZERO exchange and zero sort on the huge
  * point side — the same canonical win as [[BroadcastAsOfJoinExec]].
  * Per-probe cost is O(log n + intervals with start <= t of that key):
  * linear in per-key interval count worst-case, which a broadcast-sized
  * right bounds by construction (an interval tree would shave it to
  * O(log n + matches); not needed under the threshold).
  * Semantics identical to [[IntervalJoinExec]] — closed ends, SQL-null
  * keys/times/bounds, Inner/LeftOuter — pinned by the shared
  * differential tests.
  */
case class BroadcastIntervalJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightStart: Attribute, rightEnd: Attribute,
    payload: Seq[Attribute], joinType: JoinType,
    left: SparkPlan, right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    if (joinType == LeftOuter) left.output ++ payload.map(_.withNullability(true))
    else left.output ++ payload

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedPoints" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of points inside >= 1 interval"),
    "numUnmatchedPoints" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of points inside no interval"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastIntervalJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val outer = joinType == LeftOuter
    val (lks, rks, lt, rs, re, pay) =
      (leftKeys, rightKeys, leftTime, rightStart, rightEnd, payload)
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatchedPoints")
    val numUnmatched = longMetric("numUnmatchedPoints")
    val rBroadcast = right.executeBroadcast[Array[InternalRow]]()
    val indexSig = (rks.map(_.exprId.id) ++ Seq(rs.exprId.id, re.exprId.id) ++
      pay.map(_.exprId.id)).mkString(",")
    left.execute().mapPartitions({ lIter =>
      val index = BroadcastIntervalJoinExec.cachedIndex(
        rBroadcast.id, indexSig, rBroadcast.value, rightOut, rks, rs, re, pay)
      val lKeyProj = UnsafeProjection.create(lks, leftOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
      val resultProj =
        UnsafeProjection.create(outAttrs, leftOut ++ pay.map(_.withNullability(true)))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val nullPayload = new GenericInternalRow(pay.length)
      val joined = new JoinedRow
      lIter.flatMap { lRow =>
        val lKeyRow = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        var hits: ArrayBuffer[UnsafeRow] = null
        if (!lKeyRow.anyNull && !lTimeRow.isNullAt(0)) {
          val g = index.groups.get(lKeyRow)
          if (g != null) {
            // ub = first interval with start > t (they sort by start)
            var lo = 0; var hi = g.starts.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrd.compare(g.starts(mid), lTimeRow) <= 0) lo = mid + 1 else hi = mid
            }
            var i = 0
            while (i < lo) {
              if (timeOrd.compare(g.ends(i), lTimeRow) >= 0) {
                if (hits == null) hits = new ArrayBuffer[UnsafeRow](4)
                hits += g.payloads(i)
              }
              i += 1
            }
          }
        }
        if (hits != null) {
          numMatched += 1
          numOutputRows += hits.length
          // keep the projection LAZY — resultProj reuses one buffer
          val lCopy = lRow.copy()
          hits.iterator.map(payRow => resultProj(joined(lCopy, payRow)))
        } else {
          numUnmatched += 1
          if (outer) {
            numOutputRows += 1
            Iterator.single(resultProj(joined(lRow, nullPayload)))
          } else Iterator.empty
        }
      }
    }, preservesPartitioning = true)
  }
}

object BroadcastIntervalJoinExec {

  /** Per-key index: start-sorted parallel arrays of 1-col start/end rows
    * and payload rows.
    */
  private[plans] final class Group(
      val starts: Array[UnsafeRow], val ends: Array[UnsafeRow],
      val payloads: Array[UnsafeRow])
  private[plans] final class Index(val groups: java.util.HashMap[UnsafeRow, Group])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.ref.SoftReference[Index]]()

  private[plans] def cachedIndex(broadcastId: Long, sig: String,
      rows: Array[InternalRow], rightOut: Seq[Attribute],
      rks: Seq[Attribute], rs: Attribute, re: Attribute,
      pay: Seq[Attribute]): Index = {
    val key = s"$broadcastId:$sig"
    val ref = cache.get(key)
    val hit = if (ref != null) ref.get else null
    if (hit != null) return hit
    // purge GC-cleared slots — same hygiene as BroadcastAsOfJoinExec
    cache.forEach { (k, r) => if (r.get == null) cache.remove(k, r) }
    val built = build(rows, rightOut, rks, rs, re, pay)
    cache.put(key, new java.lang.ref.SoftReference(built))
    built
  }

  private def build(rows: Array[InternalRow], rightOut: Seq[Attribute],
      rks: Seq[Attribute], rs: Attribute, re: Attribute,
      pay: Seq[Attribute]): Index = {
    val rKeyProj = UnsafeProjection.create(rks, rightOut)
    val rStartProj = UnsafeProjection.create(Seq(rs), rightOut)
    val rEndProj = UnsafeProjection.create(Seq(re), rightOut)
    val payloadProj = UnsafeProjection.create(pay, rightOut)
    val startOrd = RowOrdering.createNaturalAscendingOrdering(Seq(rs.dataType))
    val grouped = new java.util.HashMap[
      UnsafeRow, ArrayBuffer[(UnsafeRow, UnsafeRow, UnsafeRow)]]()
    rows.foreach { row =>
      val k = rKeyProj(row)
      if (!k.anyNull) { // SQL join semantics: null never matches
        val s0 = rStartProj(row)
        val e0 = rEndProj(row)
        if (!s0.isNullAt(0) && !e0.isNullAt(0)) { // null bounds match nothing
          var buf = grouped.get(k)
          if (buf == null) {
            buf = new ArrayBuffer[(UnsafeRow, UnsafeRow, UnsafeRow)]
            grouped.put(k.copy(), buf)
          }
          buf += ((s0.copy(), e0.copy(), payloadProj(row).copy()))
        }
      }
    }
    val groups = new java.util.HashMap[UnsafeRow, Group](grouped.size())
    grouped.forEach { (k, buf) =>
      val sorted = buf.sortInPlace()(Ordering.comparatorToOrdering(
        new java.util.Comparator[(UnsafeRow, UnsafeRow, UnsafeRow)] {
          override def compare(a: (UnsafeRow, UnsafeRow, UnsafeRow),
              b: (UnsafeRow, UnsafeRow, UnsafeRow)): Int = startOrd.compare(a._1, b._1)
        }))
      groups.put(k, new Group(sorted.map(_._1).toArray, sorted.map(_._2).toArray,
        sorted.map(_._3).toArray))
    }
    new Index(groups)
  }
}

/** DataFrame front door for the native operator. */
object NativeIntervalJoin {

  /** Inner-join `points` to the `intervals` of the same `key` that
    * contain `pointTime` (closed ends): output = point columns ++
    * `payloadCols` from the interval side, one row per containing
    * interval.
    *
    * The interval side is re-projected to (key, start, end, payload)
    * with fresh expression ids (self-joins stay unambiguous; the scan
    * prunes to those columns). Payload names must not collide with
    * point column names; key and time dtypes must match across sides.
    */
  def contain(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: String, startCol: String, endCol: String,
      payloadCols: Seq[String], joinType: JoinType = Inner,
      broadcast: Option[Boolean] = None): DataFrame =
    containKeys(points, intervals, Seq(key), pointTime, startCol, endCol,
      payloadCols, joinType, broadcast)

  /** [[contain]] on a COMPOSITE key — same rules as
    * [[NativeAsOfJoin.asOfKeys]]: both sides cluster and sort on all
    * key columns; a null in any key column matches nothing.
    */
  def containKeys(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointTime: String, startCol: String, endCol: String,
      payloadCols: Seq[String], joinType: JoinType = Inner,
      broadcast: Option[Boolean] = None): DataFrame = {
    val node = buildNode(points.queryExecution.analyzed,
      intervals.queryExecution.analyzed, keys, pointTime, startCol, endCol,
      payloadCols, joinType, broadcast)
    Bridge.ofRows(points.sparkSession, node)
  }

  /** Resolve names → attributes and assemble the logical node; shared by
    * the DataFrame front door above and the SQL TVF resolution rule
    * ([[ResolveGraftJoins]]). Both child plans must be analyzed.
    */
  private[plans] def buildNode(lPlan: LogicalPlan, rAnalyzed0: LogicalPlan,
      keys: Seq[String], pointTime: String, startCol: String, endCol: String,
      payloadCols: Seq[String], joinType: JoinType = Inner,
      broadcast: Option[Boolean] = None): IntervalJoinNode = {
    require(keys.nonEmpty, "contain: need at least one key column")
    // honor functions.broadcast(intervals) like a builtin join — same
    // rationale as NativeAsOfJoin.buildNode (explicit knob wins)
    val (rAnalyzed, hinted) = rAnalyzed0 match {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
          if h.hints.strategy.contains(
            org.apache.spark.sql.catalyst.plans.logical.BROADCAST) =>
        (h.child, Some(true))
      case other => (other, None)
    }
    val bcast = broadcast.orElse(hinted)
    // session-resolver name matching (case-insensitive under the default
    // spark.sql.caseSensitive=false) — same contract as NativeAsOfJoin
    val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
    val clash = payloadCols.filter(n => lPlan.output.exists(a => resolver(a.name, n)))
    require(clash.isEmpty,
      s"contain: payload columns ${clash.mkString(", ")} collide with point columns — " +
        "rename them on the interval side before joining")
    val needed = (keys ++ Seq(startCol, endCol) ++ payloadCols).distinct
    def rAttr(n: String): Attribute = rAnalyzed.output.find(a => resolver(a.name, n)).getOrElse(
      throw new IllegalArgumentException(s"contain: interval column $n not found"))
    val rPlan = Project(needed.map(n => Alias(rAttr(n), n)()), rAnalyzed)
    def pick(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(a => resolver(a.name, n)).getOrElse(
        throw new IllegalArgumentException(s"contain: $side column $n not found"))
    val lKeyAs = keys.map(pick(lPlan.output, _, "point"))
    val rKeyAs = keys.map(pick(rPlan.output, _, "interval"))
    val (lTimeA, rStartA, rEndA) = (pick(lPlan.output, pointTime, "point"),
      pick(rPlan.output, startCol, "interval"), pick(rPlan.output, endCol, "interval"))
    keys.indices.foreach { i =>
      require(lKeyAs(i).dataType == rKeyAs(i).dataType,
        s"contain: key dtype mismatch — point ${keys(i)} is ${lKeyAs(i).dataType.sql}, " +
          s"interval ${keys(i)} is ${rKeyAs(i).dataType.sql}; cast one side before joining")
    }
    require(lTimeA.dataType == rStartA.dataType && rStartA.dataType == rEndA.dataType,
      s"contain: time dtype mismatch — $pointTime is ${lTimeA.dataType.sql}, " +
        s"$startCol is ${rStartA.dataType.sql}, $endCol is ${rEndA.dataType.sql}; " +
        "cast to one type before joining")
    IntervalJoinNode(lPlan, rPlan, lKeyAs, rKeyAs, lTimeA, rStartA, rEndA,
      payloadCols.map(pick(rPlan.output, _, "interval")), joinType, bcast)
  }
}
