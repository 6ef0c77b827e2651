package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import scala.collection.concurrent.TrieMap

/** SQL front door for MANIFESTED layouts as named tables: register a
  * parquet directory once —
  * {{{
  *   GraftTables.register("events", "/lake/events")
  *   spark.sql("SELECT * FROM graft.events WHERE ts BETWEEN 10 AND 20")
  * }}}
  * — and every `graft.<name>` reference in SQL text resolves to the
  * SAME V1 parquet relation a `spark.read.parquet(path)` produces, so
  * the whole file-skipping subsystem applies unchanged: the static
  * rule ([[ManifestFileSkipping]]) prunes the file list from the
  * WHERE clause at optimization, and the runtime rule
  * ([[org.apache.spark.sql.execution.graftdpp.DynamicManifestFileSkipping]])
  * prunes it again from a broadcast join's actual keys. This closes
  * the engine-owned-planning loop for SQL-only users the same way the
  * TVFs ([[SqlFrontDoor]]) did for the native joins.
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
  * semantics); re-registering a name replaces its path. Metadata-only:
  * registration stores a string, the parquet relation (schema read)
  * is built lazily at first resolution per query.
  */
object GraftTables {

  /** The identifier prefix SQL uses: `graft`.`<name>`. */
  val Namespace = "graft"

  private val tables = TrieMap.empty[String, String]

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
}

/** Analyzer rule (injectResolutionRule): swap `UnresolvedRelation`s
  * named `graft`.`<registered>` for the registered path's V1 parquet
  * relation. Fires only on the exact two-part form — one-part names,
  * other catalogs, and unregistered names pass through untouched.
  */
class ResolveGraftTables(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase(GraftTables.Namespace) =>
      GraftTables.lookup(u.multipartIdentifier(1)) match {
        // the reader's eager resolveRelation yields the same
        // LogicalRelation(HadoopFsRelation) as path-based access —
        // the shape the manifest rules match
        case Some(path) => spark.read.parquet(path).queryExecution.logical
        case None => u
      }
  }
}
