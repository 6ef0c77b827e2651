package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedException, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** SQL front door for the native whole-operator joins: table-valued
  * functions (`injectTableFunction`) that let a SQL-only user reach
  * [[AsOfJoinExec]] / [[IntervalJoinExec]] from ONE SQL text —
  *
  * {{{
  *   SELECT * FROM graft_asof_join(
  *     'purchases', 'clicks',          -- left / right table or view
  *     'user_id', 'ts', 'click_ts',   -- key (CSV for composite), left/right time
  *     'click_id,click_value')         -- payload columns (CSV)
  *     -- optional 7th arg: 'left' (default) or 'inner'
  *     -- optional 8th arg: integer lookback tolerance (time-column
  *        units; micros for timestamps) — pandas merge_asof tolerance
  *     -- optional 9th arg: 'backward' (default) | 'forward' | 'nearest'
  *        — pandas merge_asof direction
  *
  *   SELECT * FROM graft_interval_join(
  *     'clicks', 'windows',            -- points / intervals
  *     'user_id', 'ts',                -- key (CSV for composite), point time
  *     'win_start', 'win_end',         -- interval bounds
  *     'win_id')                       -- payload columns (CSV)
  *     -- optional 8th arg: 'inner' (default) or 'left'
  * }}}
  *
  * The TVF builder runs BEFORE its inputs are resolved, so it cannot
  * pick attributes yet: it plants an [[UnresolvedGraftAsOfJoin]] /
  * [[UnresolvedGraftIntervalJoin]] placeholder over
  * `UnresolvedRelation` children, and the injected analyzer rule
  * [[ResolveGraftJoins]] (`injectResolutionRule`) rewrites the
  * placeholder into the real [[AsOfJoinNode]] / [[IntervalJoinNode]]
  * once both children have resolved — through the SAME
  * `buildNode` used by the DataFrame front doors, so name checks,
  * dtype fail-fasts, and the right-side pruning Project are identical
  * on both paths. From there the ordinary planner strategy takes over
  * and the query runs on the native sort-merge exec; the pushdown
  * rules ([[PushLeftFiltersThroughAsOf]],
  * [[PushFiltersThroughIntervalJoin]]) apply unchanged.
  */
object SqlFrontDoor {

  /** Placeholder planted by the `graft_asof_join` TVF builder. */
  case class UnresolvedGraftAsOfJoin(
      left: LogicalPlan, right: LogicalPlan,
      keys: Seq[String], leftTime: String, rightTime: String,
      payload: Seq[String], joinType: JoinType,
      within: Option[Long] = None,
      direction: AsOfDirection = AsOfDirection.Backward) extends BinaryNode {
    override lazy val resolved: Boolean = false
    override def output: Seq[Attribute] = throw new UnresolvedException("output")
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedGraftAsOfJoin =
      copy(left = newLeft, right = newRight)
  }

  /** Placeholder planted by the `graft_interval_join` TVF builder. */
  case class UnresolvedGraftIntervalJoin(
      left: LogicalPlan, right: LogicalPlan,
      keys: Seq[String], pointTime: String, startCol: String, endCol: String,
      payload: Seq[String], joinType: JoinType = Inner) extends BinaryNode {
    override lazy val resolved: Boolean = false
    override def output: Seq[Attribute] = throw new UnresolvedException("output")
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedGraftIntervalJoin =
      copy(left = newLeft, right = newRight)
  }

  private def strArg(fn: String, args: Seq[Expression], i: Int, what: String): String =
    args(i) match {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} ($what) must be a string literal, got $other")
    }

  private def rel(name: String): LogicalPlan =
    UnresolvedRelation(name.split('.').toSeq)

  private def csv(s: String): Seq[String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  /** `(identifier, info, builder)` triple for `injectTableFunction`. */
  val asOfTvf: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("graft_asof_join"),
      new ExpressionInfo("graft.plans.SqlFrontDoor", "graft_asof_join"),
      (args: Seq[Expression]) => {
        require(args.size >= 6 && args.size <= 9,
          "graft_asof_join(left_table, right_table, key, left_time, right_time, " +
            "payload_csv[, 'left'|'inner'[, tolerance[, direction]]]) " +
            "expects 6-9 literal arguments")
        def a(i: Int, what: String) = strArg("graft_asof_join", args, i, what)
        val joinType = if (args.size < 7) LeftOuter
          else a(6, "join type").toLowerCase match {
            case "left" => LeftOuter
            case "inner" => Inner
            case other => throw new IllegalArgumentException(
              s"graft_asof_join: join type must be 'left' or 'inner', got '$other'")
          }
        // optional 8th arg: lookback tolerance (integer literal, in the
        // time column's own units — micros for timestamps)
        val within = if (args.size < 8) None else args(7) match {
          case Literal(v: Int, _) => Some(v.toLong)
          case Literal(v: Long, _) => Some(v)
          case other => throw new IllegalArgumentException(
            s"graft_asof_join: argument 8 (tolerance) must be an integer literal, got $other")
        }
        // optional 9th arg: 'backward' (default) | 'forward' | 'nearest'
        val direction = if (args.size < 9) AsOfDirection.Backward
          else AsOfDirection.parse(a(8, "direction"))
        UnresolvedGraftAsOfJoin(rel(a(0, "left table")), rel(a(1, "right table")),
          csv(a(2, "key")), a(3, "left time"), a(4, "right time"),
          csv(a(5, "payload")), joinType, within, direction)
      })

  /** `(identifier, info, builder)` triple for `injectTableFunction`. */
  val intervalTvf: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("graft_interval_join"),
      new ExpressionInfo("graft.plans.SqlFrontDoor", "graft_interval_join"),
      (args: Seq[Expression]) => {
        require(args.size == 7 || args.size == 8,
          "graft_interval_join(points_table, intervals_table, key, point_time, " +
            "start_col, end_col, payload_csv[, 'inner'|'left']) expects 7-8 " +
            "string-literal arguments")
        def a(i: Int, what: String) = strArg("graft_interval_join", args, i, what)
        val joinType = if (args.size < 8) Inner
          else a(7, "join type").toLowerCase match {
            case "inner" => Inner
            case "left" => LeftOuter
            case other => throw new IllegalArgumentException(
              s"graft_interval_join: join type must be 'inner' or 'left', got '$other'")
          }
        UnresolvedGraftIntervalJoin(rel(a(0, "points table")), rel(a(1, "intervals table")),
          csv(a(2, "key")), a(3, "point time"), a(4, "start"), a(5, "end"),
          csv(a(6, "payload")), joinType)
      })
}

/** Analyzer resolution rule: swap each placeholder for the real native
  * join node as soon as both inputs are resolved (fixed-point batch —
  * view expansion on the `UnresolvedRelation` children happens on
  * earlier passes of the same batch).
  */
object ResolveGraftJoins extends Rule[LogicalPlan] {
  import SqlFrontDoor._
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedGraftAsOfJoin if u.childrenResolved =>
      NativeAsOfJoin.buildNode(u.left, u.right,
        u.keys, u.leftTime, u.rightTime, u.payload, u.joinType, u.within, u.direction)
    case u: UnresolvedGraftIntervalJoin if u.childrenResolved =>
      NativeIntervalJoin.buildNode(u.left, u.right,
        u.keys, u.pointTime, u.startCol, u.endCol, u.payload, u.joinType)
  }
}
