package graft.plans

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types._

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

/** AUTOMATIC stats-based file skipping: the optimizer-rule form of
  * [[graft.sources.ManifestScan.readRange]]. Where that API asks the
  * caller to route reads through an explicit method, this rule makes
  * the plain declarative form — `spark.read.parquet(path).filter(col
  * BETWEEN lo AND hi)` — consult the stored `_graft_manifest` during
  * optimization and replace the scan's [[FileIndex]] with one that
  * never lists the provably-empty files. The same transparent
  * data-skipping contract Delta/Iceberg derive from their commit logs,
  * here as a `Rule[LogicalPlan]` over an engine-owned manifest,
  * installed by [[graft.GraftExtensions]] (`injectOptimizerRule`) and
  * switchable per session via `spark.graft.manifestSkip.enabled`.
  *
  * Safety contract (all directions conservative):
  *   - a file is skipped ONLY when its manifest row proves no value in
  *     the queried range (max < lo, min > hi, or an all-null stats
  *     column) — min/max are exact, not estimates;
  *   - files the manifest does not mention are always kept (a stale
  *     manifest after appends loses skipping, never rows — and a
  *     REWRITTEN layout gets fresh part-file names, so stale skip
  *     entries match nothing at all);
  *   - the original Filter stays above the pruned scan, so kept files
  *     are still row-filtered: the rewrite is plan-only, never
  *     semantic. `q_source_manifest_auto` pins rule-on ≡ DuckDB
  *     full-scan; ManifestRuleSpec pins rule-on ≡ rule-off.
  *
  * Each filter CONJUNCT over a bare integral scan column becomes an
  * INTERVAL-SET constraint (`>=`, `>`, `<=`, `<`, `=`, `<=>`, literal
  * on either side; IN as singleton intervals; same-column Or as
  * interval union and nested And as intersection — so an index probe's
  * `z BETWEEN .. OR z BETWEEN ..` disjunction, the shape
  * [[graft.operators.ZOrder.zQueryRanges]] emits, prunes at file
  * grain). A file must overlap at least one interval of EVERY
  * constraint; an infeasible conjunct (empty intersection) skips every
  * manifested file — the provably-empty scan. Cast-wrapped columns and
  * cross-column disjunctions contribute nothing (kept conservative);
  * point equalities additionally probe stored per-file BLOOM filters
  * where the manifest carries them (see
  * [[graft.sources.ManifestScan.buildManifest]]), covering layouts
  * clustered by a different column where every band overlaps.
  *
  * Scale shape (100 TB): the decision is metadata-only — one driver
  * read of the manifest (one row per data file), cached per path and
  * invalidated by the manifest files' (name, length, mtime) signature,
  * so repeated queries over a stable layout pay zero I/O to plan. The
  * manifest is read with parquet-hadoop directly rather than a nested
  * Spark job: optimization never launches jobs. Partitioned (hive
  * layout) relations are left alone — partition pruning already covers
  * them; this rule is the file-grain sibling for range-clustered
  * UNPARTITIONED layouts, where Spark's own pruning has nothing to
  * hold on to.
  */
object ManifestFileSkipping extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.manifestSkip.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    plan.transform {
      case f @ Filter(cond, l: LogicalRelation) =>
        l.relation match {
          case hfs: HadoopFsRelation
              if hfs.partitionSchema.isEmpty &&
                hfs.location.rootPaths.size == 1 &&
                !hfs.location.isInstanceOf[ManifestPrunedFileIndex] =>
            val ranges = extractConstraints(cond, l.outputSet)
            val points = pointsFrom(ranges)
            if (ranges.isEmpty) f
            else {
              val spark = hfs.sparkSession
              ManifestCache.load(spark.sessionState.newHadoopConf(),
                hfs.location.rootPaths.head) match {
                case Some(m) =>
                  val ub = ranges.filter { case (c, _) => m.statsCols.contains(c) }
                  val up = points.filter { case (c, _) => m.bloomCols.contains(c) }
                  if (ub.isEmpty && up.isEmpty) f
                  else {
                    // memoize bloom probe positions per (key, k, m):
                    // they are file-independent, and recomputing the
                    // md5 family per FILE would cost keys×k digests ×
                    // a million files on a real lake
                    val posCache = new PositionCache
                    val skip = m.rows.iterator
                      .filterNot(r => overlaps(r, ub) && maybeMatchesPoints(r, up, posCache))
                      .map(_.fileName).toSet
                    if (skip.isEmpty) f
                    else f.copy(child =
                      l.copy(relation = hfs.copy(
                        location = new ManifestPrunedFileIndex(hfs.location, skip))(spark)))
                  }
                case None => f
              }
            }
          case _ => f
        }
    }
  }

  /** Closed long interval; one-sided predicates leave the other end at
    * its sentinel. `x > Long.MaxValue`-style saturation keeps the
    * interval a superset of the predicate — always safe to prune by.
    */
  private case class Bound(lo: Long, hi: Long)

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def litLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  /** Interval-set blowup cap: beyond it a set collapses to its
    * envelope [min lo, max hi] — a relaxation, so pruning stays safe.
    */
  private val MaxIntervals = 256

  private def capped(s: Seq[Bound]): Seq[Bound] =
    if (s.isEmpty || s.length <= MaxIntervals) s
    else Seq(Bound(s.iterator.map(_.lo).min, s.iterator.map(_.hi).max))

  /** One comparison → one interval on a bare integral scan column. */
  private def baseBound(e: Expression,
      scanOutput: AttributeSet): Option[(String, Bound)] = {
    def ok(a: Attribute): Boolean =
      scanOutput.contains(a) && isIntegral(a.dataType)
    val r = e match {
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) if ok(a) =>
        litLong(v).map(x => a.name -> Bound(x, Long.MaxValue))
      case GreaterThan(a: AttributeReference, Literal(v, _)) if ok(a) =>
        litLong(v).map(x => a.name -> Bound(if (x == Long.MaxValue) x else x + 1, Long.MaxValue))
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) if ok(a) =>
        litLong(v).map(x => a.name -> Bound(Long.MinValue, x))
      case LessThan(a: AttributeReference, Literal(v, _)) if ok(a) =>
        litLong(v).map(x => a.name -> Bound(Long.MinValue, if (x == Long.MinValue) x else x - 1))
      case EqualTo(a: AttributeReference, Literal(v, _)) if ok(a) =>
        litLong(v).map(x => a.name -> Bound(x, x))
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) if v != null && ok(a) =>
        litLong(v).map(x => a.name -> Bound(x, x))
      // mirrored literal-on-left forms
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) if ok(a) =>
        litLong(v).map(x => a.name -> Bound(Long.MinValue, x))
      case GreaterThan(Literal(v, _), a: AttributeReference) if ok(a) =>
        litLong(v).map(x => a.name -> Bound(Long.MinValue, if (x == Long.MinValue) x else x - 1))
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) if ok(a) =>
        litLong(v).map(x => a.name -> Bound(x, Long.MaxValue))
      case LessThan(Literal(v, _), a: AttributeReference) if ok(a) =>
        litLong(v).map(x => a.name -> Bound(if (x == Long.MaxValue) x else x + 1, Long.MaxValue))
      case EqualTo(Literal(v, _), a: AttributeReference) if ok(a) =>
        litLong(v).map(x => a.name -> Bound(x, x))
      case EqualNullSafe(Literal(v, _), a: AttributeReference) if v != null && ok(a) =>
        litLong(v).map(x => a.name -> Bound(x, x))
      case _ => None
    }
    r
  }

  /** Interpret an expression as "this ONE column lies in one of these
    * intervals". Handles the disjunctive shapes index probes emit —
    * e.g. a z-order box decomposed to `z BETWEEN .. OR z BETWEEN ..`
    * ([[graft.operators.ZOrder.zQueryRanges]]) — plus IN as singleton
    * intervals (tighter than its [min, max] band on clustered
    * layouts):
    *   - And: same column → interval intersection; only one side
    *     interpretable → that side alone (dropping a conjunct is a
    *     relaxation — pruning stays conservative);
    *   - Or: BOTH branches must constrain the SAME column (an
    *     uninterpretable branch admits anything) → interval union.
    */
  private def intervalsOf(e: Expression,
      scanOutput: AttributeSet): Option[(String, Seq[Bound])] = e match {
    case And(l, r) =>
      (intervalsOf(l, scanOutput), intervalsOf(r, scanOutput)) match {
        case (Some((c1, s1)), Some((c2, s2))) if c1 == c2 =>
          val inter = for { a <- s1; b <- s2; lo = math.max(a.lo, b.lo);
            hi = math.min(a.hi, b.hi); if lo <= hi } yield Bound(lo, hi)
          Some((c1, capped(inter))) // may be empty: provably no match
        case (Some(x), None) => Some(x)
        case (None, Some(y)) => Some(y)
        case (Some(x), Some(_)) => Some(x) // different columns: either alone is valid
        case _ => None
      }
    case Or(l, r) =>
      (intervalsOf(l, scanOutput), intervalsOf(r, scanOutput)) match {
        case (Some((c1, s1)), Some((c2, s2))) if c1 == c2 => Some((c1, capped(s1 ++ s2)))
        case _ => None
      }
    case In(a: AttributeReference, vs)
        if scanOutput.contains(a) && isIntegral(a.dataType) &&
          vs.nonEmpty && vs.length <= 1000 &&
          vs.forall { case Literal(v, _) => v != null && litLong(v).isDefined; case _ => false } =>
      Some((a.name, capped(
        vs.map { case Literal(v, _) => val x = litLong(v).get; Bound(x, x) })))
    // OptimizeIn (same fixed-point batch) rewrites IN lists past
    // spark.sql.optimizer.inSetConversionThreshold (default 10) to
    // InSet before this rule sees them — without this case, skipping
    // would silently stop at 11+ keys
    case InSet(a: AttributeReference, hset)
        if scanOutput.contains(a) && isIntegral(a.dataType) &&
          hset.nonEmpty && hset.size <= 1000 &&
          hset.forall(v => v != null && litLong(v).isDefined) =>
      Some((a.name, capped(
        hset.toSeq.map { v => val x = litLong(v).get; Bound(x, x) })))
    case _ => baseBound(e, scanOutput).map { case (c, b) => (c, Seq(b)) }
  }

  /** One interval-set constraint per interpretable conjunct; a file
    * must satisfy EVERY constraint (conjunction) by overlapping AT
    * LEAST ONE interval of each (disjunction).
    */
  private def extractConstraints(cond: Expression,
      scanOutput: AttributeSet): Seq[(String, Seq[Bound])] =
    splitConjunctivePredicates(cond).flatMap(intervalsOf(_, scanOutput))

  /** Point sets derived from the interval constraints: a conjunct
    * whose every interval is a SINGLETON (`=`, `<=>`, IN/InSet,
    * same-column ORs of equalities) is an exact point set — the probes
    * for per-file bloom skipping, where a band is useless (a
    * high-cardinality key's [min, max] spans every file of an
    * unclustered layout). Deriving from [[extractConstraints]] keeps
    * ONE literal-parsing path for ranges and blooms. Point conjuncts
    * on one column intersect; an empty intersection matches nothing,
    * so every manifested file is provably skippable (an infeasible
    * EMPTY interval set also derives the empty point set — same
    * verdict either way).
    */
  private def pointsFrom(
      constraints: Seq[(String, Seq[Bound])]): Map[String, Set[Long]] =
    constraints
      .filter { case (_, ivs) => ivs.forall(b => b.lo == b.hi) }
      .groupMapReduce(_._1)(c => c._2.iterator.map(_.lo).toSet)(_ intersect _)

  /** Could this manifest row's file hold a row matching EVERY
    * constraint? Per constraint the file's [min, max] must overlap AT
    * LEAST ONE interval (binary search over the lo-sorted set). An
    * empty interval set is an infeasible conjunct — no file matches. A
    * stats pair that is all-null means the column has no values in the
    * file, so no comparison can match there; absent/partial stats keep
    * the file (conservative).
    */
  private def overlaps(r: ManifestRow, constraints: Seq[(String, Seq[Bound])]): Boolean =
    constraints.forall { case (c, ivs) =>
      r.stats.get(c) match {
        case Some((Some(mn), Some(mx))) => ivs.exists(b => mx >= b.lo && mn <= b.hi)
        case Some((None, None)) => false // all-null column: provably no match
        case _ => true // absent/partial stats: keep (conservative)
      }
    }

  /** Bloom probe positions per (key, k, m) — computed once per skip
    * decision, shared across every file row probing the same key.
    */
  private final class PositionCache {
    private val cache = scala.collection.mutable.Map.empty[(Long, Int, Int), Array[Long]]
    def positions(key: Long, k: Int, m: Int): Array[Long] =
      cache.getOrElseUpdate((key, k, m),
        graft.sources.ManifestScan.bloomPositions(key, k, m))
  }

  /** Could this file's blooms hold ANY probed key, for every
    * point-constrained column? Bloom "no" is definitive (no false
    * negatives by construction); a column without bloom data in this
    * row keeps the file. An empty point set matches nothing.
    */
  private def maybeMatchesPoints(r: ManifestRow,
      points: Map[String, Set[Long]], posCache: PositionCache): Boolean =
    points.forall { case (c, pts) =>
      r.blooms.get(c) match {
        case Some(b) => pts.exists(key => graft.sources.ManifestScan
          .bloomHitsAll(posCache.positions(key, b.k, b.m), b.widx, b.words))
        case None => true // no bloom for this column: keep (conservative)
      }
    }

  /** Driver-side manifest load for the DYNAMIC sibling rule
    * ([[org.apache.spark.sql.execution.graftdpp.DynamicManifestFileSkipping]]),
    * sharing this rule's signature-invalidated cache — both rules pay
    * one metadata read per stable layout between them.
    */
  def loadManifest(conf: Configuration, root: Path): Option[ManifestInfo] =
    ManifestCache.load(conf, root)

  /** Drop the 60s negative-cache entry for these roots (any spelling —
    * pass both the raw and the fs-qualified path, the rule may have
    * cached either). Called by the WRITE paths the moment a manifest
    * is built or extended, so a pre-build probe's cached miss cannot
    * make the very next manifest consumer — a SQL INSERT deciding
    * whether the table carries a manifest to maintain — silently skip
    * upkeep for up to a minute.
    */
  private[graft] def invalidateNegative(roots: Path*): Unit =
    roots.foreach(ManifestCache.invalidateNegative)

  /** Files PROVABLY unable to hold any of the probed join keys — the
    * skip-set computation for runtime (join-driven) file pruning.
    * `sortedKeys` = the build side's distinct keys, ascending, when
    * they fit the key budget; None = over budget, fall back to the
    * true [lo, hi] band. Per file: the [min, max] band must admit at
    * least one key (binary search), and, when the manifest carries a
    * bloom for the column and the key set is small, the bloom must
    * admit at least one too — both conservative, so the set is safe to
    * drop without re-filtering (the join itself enforces exactness).
    */
  def dynamicSkipSet(m: ManifestInfo, column: String,
      sortedKeys: Option[Array[Long]], lo: Long, hi: Long): Set[String] = {
    // bloom probing costs keys × k digests once (position cache) plus
    // a few binary searches per file; past 1000 keys the band check
    // alone carries the decision (same limit as the static IN path)
    val bloomKeys = sortedKeys.filter(_.length <= 1000)
    val posCache = new PositionCache
    m.rows.iterator.filterNot { r =>
      val bandMaybe = r.stats.get(column) match {
        case Some((Some(mn), Some(mx))) =>
          sortedKeys match {
            case Some(ks) =>
              ks.nonEmpty && {
                val i = java.util.Arrays.binarySearch(ks, mn)
                i >= 0 || { val ip = -i - 1; ip < ks.length && ks(ip) <= mx }
              }
            case None => mx >= lo && mn <= hi
          }
        case Some((None, None)) => false // all-null column: provably no match
        case _ => true // absent/partial stats: keep (conservative)
      }
      val bloomMaybe = bandMaybe && (bloomKeys match {
        case Some(ks) => r.blooms.get(column) match {
          case Some(b) => ks.exists(key => graft.sources.ManifestScan
            .bloomHitsAll(posCache.positions(key, b.k, b.m), b.widx, b.words))
          case None => true
        }
        case None => true
      })
      bandMaybe && bloomMaybe
    }.map(_.fileName).toSet
  }

  /** Sparse per-file bloom over one column: `widx` sorted word
    * indices, `words` the matching 32-bits-per-long packed words.
    */
  final case class BloomStats(k: Int, m: Int, widx: Array[Long], words: Array[Long])

  /** Per-file long min/max stats keyed by column base name; `fileName`
    * is the part-file NAME (manifests store full `input_file_name()`
    * URIs; names are unique within the single root directory and
    * immune to scheme/authority spelling differences).
    */
  final case class ManifestRow(fileName: String,
      stats: Map[String, (Option[Long], Option[Long])],
      blooms: Map[String, BloomStats] = Map.empty)
  final case class ManifestInfo(rows: Vector[ManifestRow], statsCols: Set[String],
      bloomCols: Set[String] = Set.empty)

  /** Driver-side manifest loader, cached per data-root path and
    * invalidated by the manifest part files' (name, len, mtime)
    * signature — a stable layout plans with zero manifest I/O after
    * the first query. Any read failure degrades to None (no skipping),
    * never to an error.
    */
  private object ManifestCache {
    // SoftReference values: a long-lived session scanning MANY
    // manifested layouts (a lake has thousands) must not pin every
    // manifest — with per-file blooms those are MBs each — on the
    // driver heap forever; the GC reclaims under pressure and the next
    // query re-reads. Same discipline as the broadcast as-of index
    // cache. A cleared reference is indistinguishable from a miss.
    private val cache =
      TrieMap.empty[String, java.lang.ref.SoftReference[(String, Option[ManifestInfo])]]

    // Negative cache with a short TTL: the rule sits in a fixed-point
    // batch and fires on EVERY filtered parquet scan session-wide, so
    // an ordinary (un-manifested) lake directory would otherwise pay
    // getFileStatus + exists metadata RPCs on every optimizer pass of
    // every query, forever. The TTL (not permanence) keeps a manifest
    // built LATER in the same session discoverable within a minute —
    // object stores have no parent-dir mtime to invalidate on.
    private val NegativeTtlMs = 60000L
    private val noManifestUntil = TrieMap.empty[String, Long]

    def invalidateNegative(root: Path): Unit = noManifestUntil.remove(root.toString)

    def load(conf: Configuration, root: Path): Option[ManifestInfo] = {
      val now = System.currentTimeMillis()
      // opportunistic sweep on EVERY load: expired negative entries and
      // GC-cleared soft slots would otherwise accrete indefinitely in a
      // long-lived session filtering many distinct directories (an
      // entry was only evicted when ITS OWN path was queried again)
      noManifestUntil.foreach { case (k, d) => if (now >= d) noManifestUntil.remove(k, d) }
      cache.foreach { case (k, r) => if (r.get() == null) cache.remove(k, r) }
      if (noManifestUntil.get(root.toString).exists(now < _)) return None
      def negative(): Option[ManifestInfo] = {
        noManifestUntil.put(root.toString, now + NegativeTtlMs)
        None
      }
      val parts =
        try {
          val fs = root.getFileSystem(conf)
          if (!fs.getFileStatus(root).isDirectory) return negative()
          val mdir = new Path(root, graft.sources.ManifestScan.ManifestDir)
          if (!fs.exists(mdir)) return negative()
          // VERSIONED layouts (graft.sources.VersionedTable) keep one
          // manifest generation per version dir; resolve the pointer
          // (falling back to the max committed generation) and read
          // THAT generation — so both skipping rules always prune with
          // the same file set the versioned read path keeps. Flat
          // layouts read the directory itself, as before.
          val entries = fs.listStatus(mdir)
          val versioned = entries.filter(s =>
            s.isDirectory && s.getPath.getName.matches("v\\d+"))
          val listDir =
            if (versioned.isEmpty) mdir
            else {
              val vs = versioned.map(_.getPath.getName.drop(1).toLong).toSeq
              // total for non-empty vs (resolveVersion falls back to
              // the max generation itself)
              val v = graft.sources.VersionedTable.resolveVersion(fs, root, vs).get
              new Path(mdir, s"v$v")
            }
          fs.listStatus(listDir)
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .sortBy(_.getPath.getName).toSeq
        } catch { case NonFatal(_) => return negative() }
      if (parts.isEmpty) return negative()
      val sig = parts.map(s =>
        s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}").mkString(";")
      cache.get(root.toString).flatMap(r => Option(r.get())) match {
        case Some((s, v)) if s == sig => v
        case _ =>
          val v =
            try Some(readAll(conf, parts.map(_.getPath)))
            catch { case NonFatal(_) => None }
          cache.put(root.toString, new java.lang.ref.SoftReference((sig, v)))
          v
      }
    }

    /** Standard 3-level parquet LIST<INT64> → long array; None on any
      * shape surprise (null list, null element, legacy encoding) — the
      * caller degrades to "no bloom for this row", never to an error.
      */
    private def readLongList(g: Group, i: Int): Option[Array[Long]] =
      try {
        if (g.getFieldRepetitionCount(i) == 0) return None
        val outer = g.getGroup(i, 0) // the repeated "list" wrapper
        val n = outer.getFieldRepetitionCount(0)
        val arr = new Array[Long](n)
        var j = 0
        while (j < n) {
          val el = outer.getGroup(0, j)
          if (el.getFieldRepetitionCount(0) == 0) return None // null element
          arr(j) = el.getLong(0, 0)
          j += 1
        }
        Some(arr)
      } catch { case NonFatal(_) => None }

    private def readAll(conf: Configuration, paths: Seq[Path]): ManifestInfo = {
      val rows = Vector.newBuilder[ManifestRow]
      val cols = Set.newBuilder[String]
      val bloomColsB = Set.newBuilder[String]
      paths.foreach { p =>
        val reader: ParquetReader[Group] =
          ParquetReader.builder(new GroupReadSupport(), p).withConf(conf).build()
        try {
          var g = reader.read()
          while (g != null) {
            val t = g.getType
            var fileName: String = null
            val mins = scala.collection.mutable.Map.empty[String, Option[Long]]
            val maxs = scala.collection.mutable.Map.empty[String, Option[Long]]
            val bK = scala.collection.mutable.Map.empty[String, Int]
            val bM = scala.collection.mutable.Map.empty[String, Int]
            val bWidx = scala.collection.mutable.Map.empty[String, Array[Long]]
            val bWord = scala.collection.mutable.Map.empty[String, Array[Long]]
            (0 until t.getFieldCount).foreach { i =>
              val ft = t.getType(i)
              val name = ft.getName
              if (name == "file" && g.getFieldRepetitionCount(i) > 0)
                fileName = new Path(g.getString(i, 0)).getName
              else if (name.endsWith("_bloom_k") || name.endsWith("_bloom_m")) {
                if (ft.isPrimitive &&
                    ft.asPrimitiveType.getPrimitiveTypeName == PrimitiveTypeName.INT32 &&
                    g.getFieldRepetitionCount(i) > 0) {
                  val base = name.dropRight(8)
                  if (name.endsWith("_k")) bK(base) = g.getInteger(i, 0)
                  else bM(base) = g.getInteger(i, 0)
                }
              } else if (name.endsWith("_bloom_widx"))
                readLongList(g, i).foreach(bWidx(name.dropRight(11)) = _)
              else if (name.endsWith("_bloom_word"))
                readLongList(g, i).foreach(bWord(name.dropRight(11)) = _)
              else if ((name.endsWith("_min") || name.endsWith("_max")) &&
                  ft.isPrimitive &&
                  ft.asPrimitiveType.getPrimitiveTypeName == PrimitiveTypeName.INT64) {
                val base = name.dropRight(4)
                val v = if (g.getFieldRepetitionCount(i) > 0) Some(g.getLong(i, 0)) else None
                if (name.endsWith("_min")) mins(base) = v else maxs(base) = v
                cols += base
              }
            }
            if (fileName != null) {
              val stats = (mins.keySet ++ maxs.keySet).iterator.map { c =>
                c -> ((mins.getOrElse(c, None), maxs.getOrElse(c, None)))
              }.toMap
              // a usable bloom needs all four fields; parallel arrays
              // must agree in length (defensive — the build writes them
              // from one struct list)
              val blooms = bK.keySet.iterator.flatMap { c =>
                (bM.get(c), bWidx.get(c), bWord.get(c)) match {
                  case (Some(m), Some(wi), Some(wo))
                      if wi.length == wo.length && bK(c) >= 1 && m >= 32 =>
                    bloomColsB += c
                    Some(c -> BloomStats(bK(c), m, wi, wo))
                  case _ => None
                }
              }.toMap
              rows += ManifestRow(fileName, stats, blooms)
            }
            g = reader.read()
          }
        } finally reader.close()
      }
      ManifestInfo(rows.result(), cols.result(), bloomColsB.result())
    }
  }
}

/** [[FileIndex]] that delegates to the relation's original index and
  * drops the manifest-proven-empty files by NAME — listing, input-file
  * reporting, and size stats all see the pruned view, so downstream
  * planning (AQE sizing, maxPartitionBytes packing) works from the
  * bytes actually read. Also the rule's idempotence marker: an
  * already-pruned relation is never re-pruned.
  */
final class ManifestPrunedFileIndex(
    private val underlying: FileIndex, private val skip: Set[String],
    val isDynamic: Boolean = false)
    extends FileIndex {
  /** Exposed for plan assertions: how many files the manifest removed. */
  def skippedCount: Int = skip.size

  // Value equality over (underlying, skip): HadoopFsRelation is a case
  // class comparing its location field, so two independently-pruned
  // scans of the same relation (a self-join, both sides filtered the
  // same way) must compare equal or ReuseExchange/ReuseSubquery can
  // never dedupe them. `isDynamic` distinguishes the runtime rule's
  // wrap (its idempotence marker across AQE re-plans) and rides along
  // in equality.
  override def equals(other: Any): Boolean = other match {
    case o: ManifestPrunedFileIndex =>
      underlying == o.underlying && skip == o.skip && isDynamic == o.isDynamic
    case _ => false
  }
  override def hashCode(): Int =
    (31 * underlying.hashCode() + skip.hashCode()) * 31 + isDynamic.hashCode()

  override def rootPaths: Seq[Path] = underlying.rootPaths

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filterNot(f => skip.contains(f.getPath.getName))))

  override def inputFiles: Array[String] =
    underlying.inputFiles.filterNot(p => skip.contains(new Path(p).getName))

  override def refresh(): Unit = underlying.refresh()

  override lazy val sizeInBytes: Long =
    listFiles(Nil, Nil).iterator.flatMap(_.files).map(_.getLen).sum

  override def partitionSchema: StructType = underlying.partitionSchema
}

/** [[FileIndex]] restricting a versioned root to ONE generation's
  * manifest-listed files by NAME ([[graft.sources.VersionedTable]]):
  * the root directory holds every live generation at once, and this
  * keep-set is what makes a snapshot read see exactly its own. The
  * KEEP polarity (vs [[ManifestPrunedFileIndex]]'s skip) matters: a
  * file that appears in the directory later — a concurrent writer's
  * uncommitted generation — must stay invisible, which a skip-set
  * computed at plan time could not guarantee. Deliberately NOT the
  * prune index class, so the static skipping rule still fires on the
  * versioned scan and composes its prune-wrapper on top.
  */
final class VersionKeepFileIndex(
    private val underlying: FileIndex, private val keep: Set[String])
    extends FileIndex {
  /** Exposed for plan assertions: the generation's file count. */
  def keptCount: Int = keep.size

  // value equality for ReuseExchange/ReuseSubquery across a self-join
  // of the same snapshot — same reasoning as ManifestPrunedFileIndex
  override def equals(other: Any): Boolean = other match {
    case o: VersionKeepFileIndex => underlying == o.underlying && keep == o.keep
    case _ => false
  }
  override def hashCode(): Int = 31 * underlying.hashCode() + keep.hashCode()

  override def rootPaths: Seq[Path] = underlying.rootPaths

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => keep.contains(f.getPath.getName))))

  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(p => keep.contains(new Path(p).getName))

  override def refresh(): Unit = underlying.refresh()

  override lazy val sizeInBytes: Long =
    listFiles(Nil, Nil).iterator.flatMap(_.files).map(_.getLen).sum

  override def partitionSchema: StructType = underlying.partitionSchema
}
