package org.apache.spark.sql.execution.graftdpp

import java.util.concurrent.TimeUnit

import scala.annotation.tailrec
import scala.util.control.NonFatal

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, HashedRelation}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

import graft.plans.{ManifestFileSkipping, ManifestPrunedFileIndex}

/** JOIN-DRIVEN dynamic file skipping as an AQE rule — the AUTOMATIC
  * sibling of [[graft.sources.ManifestScan.readForJoin]], and the
  * file-grain analogue of Spark's dynamic partition pruning: a plain
  * declarative `fact.join(dim.filter(...), key)` over a fact layout
  * manifested on its join key opens only the files whose [min, max]
  * band (and per-file bloom, where stored) could hold one of the
  * build side's ACTUAL keys — keys that only exist at runtime, after
  * the broadcast stage materializes.
  *
  * Injected via `injectQueryStagePrepRule` (the
  * [[org.apache.spark.sql.graftbridge.OptimizeSkewedGraftJoin]]
  * pattern): the rule runs at every AQE re-plan; once the build side
  * is a materialized [[BroadcastQueryStageExec]], its
  * [[HashedRelation]]'s key set is read DRIVER-SIDE — the same
  * `relation.keys()` walk Spark's own `SubqueryBroadcastExec` does for
  * DPP — and the streamed scan's [[org.apache.spark.sql.execution.datasources.FileIndex]]
  * is replaced with a [[ManifestPrunedFileIndex]] dropping the
  * provably-matchless files. This file lives under
  * `org.apache.spark.sql.execution` because [[HashedRelation]] is
  * `private[execution]`.
  *
  * Safety contract:
  *   - only INNER and LEFT SEMI joins prune the streamed side (an
  *     outer join must still emit unmatched streamed rows);
  *   - MULTI-key equi-joins prune on every manifested key column: the
  *     broadcast stores the REWRITTEN key (`HashJoin.rewriteKeyExpr`
  *     packs all-integral ≤8-byte key tuples into one width-shifted
  *     long; wider/mixed tuples keep one field per key), so the walk
  *     UNPACKS each tuple back into per-key values — a file whose band
  *     admits no build value of ANY one key column provably joins
  *     nothing, so per-column skip sets union;
  *   - each pruning key must be a bare integral scan column (possibly behind
  *     the analyzer's widening Cast), reached from the join through
  *     Project/Filter only — row-local operators that cannot be
  *     changed by removing rows the join would drop anyway (a Window
  *     or Aggregate between scan and join bails out, same discipline
  *     as Spark's `PartitionPruning`);
  *   - files the manifest does not mention are always kept, the skip
  *     decision is band-overlap + bloom-membership (both conservative,
  *     no false negatives), and the join itself re-checks every
  *     surviving row — the rewrite is I/O-only;
  *   - over `spark.graft.manifestSkip.dynamic.maxKeys` (default 100k)
  *     build keys, the key set degrades to its true [min, max] band —
  *     band pruning instead of point pruning, never wrong;
  *   - any surprise (unexpected relation shape, a non-`HashedRelation`
  *     broadcast, reader failure) abandons the rewrite for that join,
  *     never errors.
  *
  * Scale shape (100 TB): this is the star-join I/O win DPP delivers on
  * hive-partitioned layouts, extended to UNPARTITIONED range-clustered
  * ones — the build side of a selective star join is small by
  * construction (that is why Spark broadcast it), its key walk is one
  * driver pass over an in-memory hash map, and the skip decision is
  * metadata-only against the manifest already cached by the static
  * rule (both rules share one signature-invalidated load per layout).
  * Pinned in ManifestRuleSpec: declarative join opens strictly fewer
  * files with the rule on, hash-equal to rule off;
  * `q_join_dynamic_prune_auto` pins end-to-end equality vs the DuckDB
  * plain-join oracle.
  */
object DynamicManifestFileSkipping extends Rule[SparkPlan] {

  val EnabledKey = "spark.graft.manifestSkip.dynamic.enabled"
  val MaxKeysKey = "spark.graft.manifestSkip.dynamic.maxKeys"

  override def apply(plan: SparkPlan): SparkPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    plan.transformUp {
      case j: BroadcastHashJoinExec if j.joinType == Inner || j.joinType == LeftSemi =>
        tryPrune(j).getOrElse(j)
    }
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def integralWidth(dt: DataType): Int = dt match {
    case ByteType => 1
    case ShortType => 2
    case IntegerType => 4
    case LongType => 8
    case _ => 0
  }

  /** The scan column behind the streamed join key: a bare integral
    * attribute, or one behind a WIDENING integral Cast (the analyzer's
    * type promotion for mixed-width equi-joins). Narrowing casts are
    * refused: they wrap (non-ANSI), so `cast(col AS int) = 5` can match
    * a row whose raw value lies outside the probed band — pruning by
    * the raw column's stats would lose it. Every step of a cast chain
    * must widen, so comparing the ATTRIBUTE's width at each level is
    * sufficient (an inner narrowing step already returned None).
    */
  private def keyColumn(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference if isIntegral(a.dataType) => Some(a)
    case c: Cast if isIntegral(c.dataType) =>
      keyColumn(c.child).filter(a => integralWidth(a.dataType) <= integralWidth(c.dataType))
    case _ => None
  }

  /** Descend to the streamed scan through row-local operators ONLY —
    * anything whose output could change when rows are removed
    * (Window, Aggregate, another join) bails out.
    */
  @tailrec private def findScan(p: SparkPlan): Option[FileSourceScanExec] = p match {
    case s: FileSourceScanExec => Some(s)
    case p: ProjectExec => findScan(p.child)
    case f: FilterExec => findScan(f.child)
    case _ => None
  }

  /** How one streamed join key participates in the skip decision:
    * which field of the broadcast's key rows carries it, its width in
    * bits (for unpacking the packed-long form), and the scan column to
    * prune on (None when the key is not a bare manifested column — it
    * still contributes its width to the unpacking arithmetic).
    */
  private final case class KeySlot(bits: Int, column: Option[String])

  /** Mirror of `HashJoin.rewriteKeyExpr`'s applicability test: all
    * keys integral and jointly ≤ 8 bytes → the broadcast stores ONE
    * packed long per key tuple (width-shifted concatenation, first key
    * in the top bits); otherwise the key rows keep one field per key.
    * The single-key case degenerates to "packed" (a bare cast-to-long)
    * either way, which is why the pre-multi-key rule could always read
    * `getLong(0)`.
    */
  private def isPacked(keys: Seq[Expression]): Boolean =
    keys.forall(k => isIntegral(k.dataType)) &&
      keys.map(k => integralWidth(k.dataType)).sum <= 8

  /** Sign-extend the low `bits` bits of `x` (the packed form stores
    * each key's two's-complement low bits).
    */
  private def signExtend(x: Long, bits: Int): Long =
    if (bits >= 64) x else (x << (64 - bits)) >> (64 - bits)

  private def tryPrune(j: BroadcastHashJoinExec): Option[BroadcastHashJoinExec] =
    try {
      val (buildPlan, streamedPlan, streamedKeys) = j.buildSide match {
        case BuildRight => (j.right, j.left, j.leftKeys)
        case BuildLeft => (j.left, j.right, j.rightKeys)
      }
      val stage = buildPlan match {
        case b: BroadcastQueryStageExec if b.isMaterialized => b
        case _ => return None
      }
      val scan = findScan(streamedPlan).getOrElse(return None)
      val relation = scan.relation
      if (relation.partitionSchema.nonEmpty || relation.location.rootPaths.size != 1)
        return None
      relation.location match {
        // idempotence across AQE re-plans (and don't fight the static
        // rule twice): one dynamic wrap per scan
        case m: ManifestPrunedFileIndex if m.isDynamic => return None
        case _ =>
      }
      val spark = relation.sparkSession
      val manifest = ManifestFileSkipping.loadManifest(
        spark.sessionState.newHadoopConf(), relation.location.rootPaths.head)
        .getOrElse(return None)

      // every key gets a slot (the packed layout needs all widths);
      // a key prunes only when it is a bare integral scan column
      // (possibly behind a widening cast) AND the manifest knows it.
      // The analyzer equalizes left/right key types, so the streamed
      // key widths ARE the build-side packing widths.
      val packed = isPacked(streamedKeys)
      val slots = streamedKeys.map { k =>
        val col = keyColumn(k)
          .filter(a => scan.output.exists(_.exprId == a.exprId))
          .map(_.name)
          .filter(c => manifest.statsCols.contains(c) || manifest.bloomCols.contains(c))
        KeySlot(integralWidth(k.dataType) * 8, col)
      }
      if (!slots.exists(_.column.isDefined)) return None

      // the materialized broadcast IS the key set — same driver-side
      // keys() walk as Spark's SubqueryBroadcastExec (DPP)
      val rel = stage.broadcast.relationFuture.get(0, TimeUnit.MILLISECONDS).value match {
        case h: HashedRelation => h
        case _ => return None
      }
      val maxKeys = conf.getConfString(MaxKeysKey, "100000").toInt
      val nSlots = slots.length
      // per pruning slot: collected values + running true band
      val keyBufs = Array.fill(nSlots)(scala.collection.mutable.ArrayBuilder.make[Long])
      val los = Array.fill(nSlots)(Long.MaxValue)
      val his = Array.fill(nSlots)(Long.MinValue)
      // precomputed shift for the packed layout: key i sits above the
      // sum of the widths after it
      val tailBits = Array.tabulate(nSlots)(i => slots.drop(i + 1).map(_.bits).sum)
      var n = 0
      val it = rel.keys()
      while (it.hasNext) {
        val row = it.next()
        if (packed) {
          if (row.numFields != 1) return None
          if (!row.isNullAt(0)) { // a null key matches nothing under =
            val v = row.getLong(0)
            var i = 0
            while (i < nSlots) {
              if (slots(i).column.isDefined) {
                val mask = if (slots(i).bits >= 64) -1L else (1L << slots(i).bits) - 1
                val ki = signExtend((v >>> tailBits(i)) & mask, slots(i).bits)
                if (ki < los(i)) los(i) = ki
                if (ki > his(i)) his(i) = ki
                if (n < maxKeys) keyBufs(i) += ki
              }
              i += 1
            }
            n += 1
          }
        } else {
          if (row.numFields != nSlots) return None
          // a null in ANY key field makes the whole tuple unmatchable
          var anyNull = false
          var i = 0
          while (i < nSlots && !anyNull) { anyNull = row.isNullAt(i); i += 1 }
          if (!anyNull) {
            i = 0
            while (i < nSlots) {
              if (slots(i).column.isDefined) {
                val ki = slots(i).bits match {
                  case 8 => row.getByte(i).toLong
                  case 16 => row.getShort(i).toLong
                  case 32 => row.getInt(i).toLong
                  case _ => row.getLong(i)
                }
                if (ki < los(i)) los(i) = ki
                if (ki > his(i)) his(i) = ki
                if (n < maxKeys) keyBufs(i) += ki
              }
              i += 1
            }
            n += 1
          }
        }
      }
      if (n == 0) return None // empty build side: AQE's empty-relation path owns it
      // a file provably unable to match ANY build value of SOME key
      // column cannot produce a join row — skip sets UNION across keys
      val skip = slots.indices.iterator.flatMap { i =>
        slots(i).column match {
          case Some(c) =>
            val sortedKeys = if (n <= maxKeys) Some {
              val a = keyBufs(i).result(); java.util.Arrays.sort(a); a
            } else None
            ManifestFileSkipping.dynamicSkipSet(manifest, c, sortedKeys, los(i), his(i))
          case None => Iterator.empty
        }
      }.toSet
      if (skip.isEmpty) return None
      val pruned = new ManifestPrunedFileIndex(relation.location, skip, isDynamic = true)
      val newScan = scan.copy(relation = relation.copy(location = pruned)(spark))
      val newStreamed = streamedPlan.transformUp {
        case s: FileSourceScanExec if s eq scan => newScan
      }
      Some(j.buildSide match {
        case BuildRight => j.copy(left = newStreamed)
        case BuildLeft => j.copy(right = newStreamed)
      })
    } catch { case NonFatal(_) => None }
}
