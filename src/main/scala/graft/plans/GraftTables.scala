package graft.plans

import graft.sources.{ManifestScan, VersionedTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

/** SQL front door for MANIFESTED layouts as named tables: register a
  * parquet directory once —
  * {{{
  *   GraftTables.register("events", "/lake/events")
  *   spark.sql("SELECT * FROM graft.events WHERE ts BETWEEN 10 AND 20")
  *   spark.sql("INSERT INTO graft.events SELECT * FROM staged")
  * }}}
  * — and every `graft.<name>` reference in SQL text resolves to the
  * SAME V1 parquet relation a `spark.read.parquet(path)` produces, so
  * the whole file-skipping subsystem applies unchanged: the static
  * rule ([[ManifestFileSkipping]]) prunes the file list from the
  * WHERE clause at optimization, and the runtime rule
  * ([[org.apache.spark.sql.execution.graftdpp.DynamicManifestFileSkipping]])
  * prunes it again from a broadcast join's actual keys. This closes
  * the engine-owned-planning loop for SQL-only users the same way the
  * TVFs ([[SqlFrontDoor]]) did for the native joins. A name whose
  * path is under VERSIONED management
  * ([[graft.sources.VersionedTable]]) resolves to the CURRENT
  * version's snapshot — the only correct read of a versioned root,
  * since the raw directory holds every live generation.
  *
  * The WRITE side: `INSERT INTO graft.<name>` rewrites to
  * [[GraftInsertCommand]], which routes through the same write paths
  * Scala callers use — [[graft.sources.VersionedTable.append]] for
  * versioned layouts (a real commit: new generation + pointer flip)
  * and [[graft.sources.ManifestScan.writeAppend]] for flat manifested
  * ones (append + refresh in one call) — so a SQL writer CANNOT
  * forget manifest upkeep, and a declarative read prunes the moment
  * the INSERT returns. Stats/bloom columns are inherited from the
  * existing manifest (self-describing schema); a registered path with
  * no manifest gets a plain parquet append.
  *
  * Deliberately NOT a DSv2 `TableCatalog`: a v2 catalog's tables plan
  * through the DataSource-v2 scan path, which bypasses the V1
  * `LogicalRelation(HadoopFsRelation)` shape both manifest rules
  * rewrite (and Spark only converts a v2-catalog `V1Table` back to V1
  * for the session catalog). A resolution rule that plants the V1
  * relation — the [[ResolveGraftJoins]] placeholder pattern — keeps
  * ONE read path for path-based and named access, so `q_source_sql_table`
  * can pin the two hash-equal. The analyzer reaches this rule because
  * an unregistered two-part name is simply left unresolved by the
  * builtin resolvers (no `graft` catalog or database exists) until
  * checkAnalysis — so unknown names still fail with the ordinary
  * TABLE_OR_VIEW_NOT_FOUND, not a graft-specific error.
  *
  * The registry is process-wide and case-insensitive (SQL identifier
  * semantics); re-registering a name replaces its path. Registration
  * stores a string; the resolved RELATION is built lazily and cached
  * by (path, layout signature) — one schema-inference footer read per
  * layout GENERATION, not per statement (a SQL-heavy session
  * previously paid a footer read per query per table). The signature
  * is the current version + its manifest listing for versioned
  * layouts, the recursive data-file (name, len, mtime) listing for
  * flat ones — the same invalidation discipline as the manifest
  * cache, so appends/compactions are picked up by the next statement.
  */
object GraftTables {

  /** The identifier prefix SQL uses: `graft`.`<name>`. */
  val Namespace = "graft"

  private val tables = TrieMap.empty[String, String]

  // (signature, resolved relation plan) per path; TrieMap for lock-free
  // concurrent sessions of one JVM (same scope as the manifest caches).
  // SoftReference values, same discipline as ManifestCache next door: a
  // resolved relation pins its whole file-listing index (every
  // FileStatus of every live generation — far heavier than a manifest),
  // and a session registering thousands of lake tables must not pin
  // them all on the driver heap forever. A GC-cleared slot is a miss.
  private val relations =
    TrieMap.empty[String, java.lang.ref.SoftReference[(String, LogicalPlan)]]
  private val builds = new java.util.concurrent.atomic.AtomicLong

  /** How many times a relation was actually (re)built — i.e. schema
    * inference ran. Exposed for the cache-effectiveness pin in
    * ManifestRuleSpec.
    */
  def relationBuilds: Long = builds.get()

  /** Register (or replace) `graft.<name>` -> parquet directory. The
    * registry is process-wide, not per-session — every session of this
    * JVM sees the name (same scope as the manifest caches).
    */
  def register(name: String, path: String): Unit = {
    require(name.nonEmpty && path.nonEmpty, "GraftTables.register: empty name or path")
    tables.put(name.toLowerCase(java.util.Locale.ROOT), path)
  }

  def unregister(name: String): Unit =
    tables.remove(name.toLowerCase(java.util.Locale.ROOT))

  def lookup(name: String): Option[String] =
    tables.get(name.toLowerCase(java.util.Locale.ROOT))

  /** Layout signature for cache invalidation: cheap FS metadata only
    * (no footer reads, one listStatus per directory — never a
    * getFileStatus per file, which would be a HEAD request per file
    * per statement on an object store). Any failure degrades to a
    * unique value — i.e. an uncacheable build, never a stale relation.
    */
  private def signature(spark: SparkSession, path: String): String =
    try {
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      VersionedTable.currentVersion(fs, root) match {
        case Some(v) =>
          val vdir = new Path(new Path(root, ManifestScan.ManifestDir), s"v$v")
          val parts = fs.listStatus(vdir).filter(_.isFile)
            .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
            .sorted.mkString(";")
          s"v$v;$parts"
        case None =>
          ManifestScan.listDataStatuses(fs, root)
            .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
            .sorted.mkString(";")
      }
    } catch { case NonFatal(_) => s"unsig:${java.util.UUID.randomUUID()}" }

  /** SQL time travel over registered VERSIONED tables — the TVF
    * completing X231 for SQL-only users (Delta's `VERSION AS OF`, as a
    * table function):
    * {{{
    *   SELECT * FROM graft_snapshot('events', 3)
    * }}}
    * Both arguments are literals, so unlike the join TVFs
    * ([[SqlFrontDoor]]) no placeholder/resolution-rule dance is needed:
    * the builder resolves the snapshot relation directly (the
    * generation's keep-indexed single-root relation, composable with
    * both skipping rules). Unregistered names and missing versions fail
    * with the underlying errors, naming what exists.
    */
  def snapshotTvf: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] => LogicalPlan) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_snapshot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.plans.GraftTables", "graft_snapshot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
        require(args.length == 2,
          "graft_snapshot(name string literal, version integer literal)")
        val name = args.head match {
          case Literal(v, StringType) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"graft_snapshot: argument 1 (name) must be a string literal, got $other")
        }
        val version = args(1) match {
          case Literal(v: Integer, IntegerType) => v.toLong
          case Literal(v: java.lang.Long, LongType) => v.longValue()
          case other => throw new IllegalArgumentException(
            s"graft_snapshot: argument 2 (version) must be an integer literal, got $other")
        }
        val path = lookup(name).getOrElse(throw new IllegalArgumentException(
          s"graft_snapshot: no registered table graft.$name"))
        VersionedTable.snapshotAt(
          org.apache.spark.sql.SparkSession.active, path, version)
          .queryExecution.analyzed
      })

  /** The V1 relation plan for a registered path — cached per layout
    * generation. Versioned roots resolve to the CURRENT snapshot
    * (keep-indexed single-root relation); flat roots to the plain
    * parquet relation, the shape both manifest rules rewrite. Reuse
    * across queries (and across both sides of a self-join) is safe:
    * LogicalRelation is a MultiInstanceRelation, so the analyzer's
    * DeduplicateRelations re-aliases conflicting attribute ids exactly
    * as it does for catalog tables.
    */
  private[plans] def resolvedRelation(spark: SparkSession, path: String): LogicalPlan = {
    val sig = signature(spark, path)
    relations.get(path).flatMap(r => Option(r.get())) match {
      case Some((s, plan)) if s == sig => plan
      case _ =>
        builds.incrementAndGet()
        val plan =
          if (VersionedTable.isVersioned(spark, path))
            VersionedTable.read(spark, path).queryExecution.analyzed
          else
            // ANALYZED, not logical: since Spark 4 the reader's logical
            // plan is a lazy UnresolvedDataSource (empty schema, footer
            // read deferred to each statement's analysis — the exact
            // per-statement cost this cache exists to kill); analysis
            // here yields the LogicalRelation(HadoopFsRelation) both
            // manifest rules rewrite
            spark.read.parquet(path).queryExecution.analyzed
        relations.put(path, new java.lang.ref.SoftReference((sig, plan)))
        plan
    }
  }
}

/** Analyzer rule (injectResolutionRule): swap `UnresolvedRelation`s
  * named `graft`.`<registered>` for the registered path's V1 parquet
  * relation (cached per layout generation), and rewrite
  * `INSERT INTO graft.<registered>` into [[GraftInsertCommand]]. Fires
  * only on the exact two-part form — one-part names, other catalogs,
  * and unregistered names pass through untouched.
  */
class ResolveGraftTables(spark: SparkSession) extends Rule[LogicalPlan] {

  private def registered(p: LogicalPlan): Option[(String, String)] = p match {
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase(GraftTables.Namespace) =>
      val name = u.multipartIdentifier(1)
      GraftTables.lookup(name).map(name -> _)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // INSERT targets must NOT be swapped for relations: resolveOperatorsUp
    // visits the statement's table child BEFORE the statement itself, and
    // a planted relation would turn the statement into Spark's own V1
    // insert (InsertIntoHadoopFsRelationCommand) — a plain parquet append
    // that silently bypasses manifest upkeep and versioned commits. Track
    // them by identity (this traversal rebuilds parents, not the visited
    // originals) and leave them to the statement-level rewrite.
    val insertTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case i: InsertIntoStatement => insertTargets.add(i.table)
      case _ =>
    }
    plan.resolveOperatorsUp {
      // the statement is claimed IMMEDIATELY (query resolved or not) by
      // a placeholder whose child is the source query: the analyzer
      // keeps resolving the child through the placeholder, so a query
      // that can never resolve (a typo'd column) fails with ITS OWN
      // error — not a misleading TABLE_OR_VIEW_NOT_FOUND on the insert
      // target, which a query-resolved gate on this rewrite would leave
      // unresolved for checkAnalysis to blame first
      case i: InsertIntoStatement if registered(i.table).isDefined =>
        val (name, path) = registered(i.table).get
        if (i.overwrite || i.partitionSpec.nonEmpty || i.ifPartitionNotExists)
          throw new UnsupportedOperationException(
            s"graft.$name: only plain INSERT INTO is supported (append-only manifested " +
              "layout - no OVERWRITE, no PARTITION spec); compact()/vacuum() are the " +
              "maintenance ops")
        if (i.userSpecifiedCols.nonEmpty)
          throw new UnsupportedOperationException(
            s"graft.$name: INSERT with an explicit column list is not supported - " +
              "supply every table column in order")
        GraftInsertPlaceholder(name, path, i.query)

      // ... and converts to the runnable command once the child is whole
      case p: GraftInsertPlaceholder if p.child.resolved =>
        GraftInsertCommand(p.name, p.path, p.child)

      case u: UnresolvedRelation if !insertTargets.contains(u) && registered(u).isDefined =>
        GraftTables.resolvedRelation(spark, registered(u).get._2)
    }
  }
}

/** Intermediate node between `INSERT INTO graft.<name>` and
  * [[GraftInsertCommand]]: holds the source query as a real CHILD so
  * the analyzer resolves it in place (and reports ITS errors when it
  * cannot), never itself resolved — conversion in [[ResolveGraftTables]]
  * is the only way out, so an unconverted placeholder fails analysis
  * loudly instead of executing as something else. The
  * [[ResolveGraftJoins]] placeholder pattern applied to a command.
  */
final case class GraftInsertPlaceholder(name: String, path: String,
    child: LogicalPlan)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = Nil
  override lazy val resolved: Boolean = false
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftInsertPlaceholder =
    copy(child = newChild)
}

/** `INSERT INTO graft.<name>` as a runnable command: align the query's
  * columns to the table schema BY POSITION (cast to the table types,
  * Spark's store-assignment shape), then append through the SAME
  * closure Scala writers use — [[VersionedTable.append]] (a commit)
  * when the layout is versioned, [[ManifestScan.writeAppend]]
  * (append + manifest refresh) when it carries a flat manifest, plain
  * parquet append otherwise. Executed eagerly by `spark.sql` like any
  * command; returns no rows.
  */
final case class GraftInsertCommand(name: String, path: String, query: LogicalPlan)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = Bridge.ofRows(spark, query)
    val versioned = VersionedTable.isVersioned(spark, path)
    // target schema from the per-generation relation cache — an
    // ingest-heavy SQL session must not pay a directory listing +
    // footer inference per INSERT statement (the cost the cache
    // exists to amortize; the signature check inside is metadata-only)
    val target = GraftTables.resolvedRelation(spark, path).schema
    require(src.schema.length == target.length,
      s"INSERT INTO graft.$name: query has ${src.schema.length} columns, " +
        s"table has ${target.length}")
    val shaped = src.toDF(target.fieldNames.toSeq: _*)
      .select(target.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    if (versioned) {
      VersionedTable.append(shaped, path)
    } else {
      // the WRITE path must not trust a cached "no manifest here": a
      // pre-build probe's 60s negative entry would silently degrade
      // this INSERT to a plain parquet append with no manifest row,
      // breaking the "a SQL writer cannot forget upkeep" contract.
      // Drop the entry first — the load below then probes disk (the
      // POSITIVE cache still short-circuits via its signature check).
      ManifestFileSkipping.invalidateNegative(new Path(path))
      // stats/bloom columns from the signature-cached manifest load
      // shared with both skipping rules — zero extra I/O when warm
      ManifestFileSkipping.loadManifest(
        spark.sessionState.newHadoopConf(), new Path(path)) match {
        case Some(m) =>
          ManifestScan.writeAppend(shaped, path,
            m.statsCols.toSeq.sorted, m.bloomCols.toSeq.sorted)
        case None => shaped.write.mode("append").parquet(path)
      }
    }
    Seq.empty
  }
}
