package graft

import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

/** The SQL front door to the native whole-operator joins: the
  * graft_asof_join / graft_interval_join table-valued functions
  * (injectTableFunction + injectResolutionRule in GraftExtensions)
  * must plan the SAME native execs the DataFrame API reaches, agree
  * with the DataFrame results bit-for-bit, and keep the pushdown
  * rules and fail-fast guards working through the SQL path.
  */
class SqlFrontDoorSpec extends SparkSpec {

  import spark.implicits._

  private def registerViews(): Unit = {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
      .createOrReplaceTempView("sfd_purchases")
    ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id"))
      .createOrReplaceTempView("sfd_clicks")
  }

  test("graft_asof_join SQL plans the native AsOfJoin exec") {
    registerViews()
    val df = spark.sql(
      """SELECT purchase_id, user_id, click_id
        |FROM graft_asof_join('sfd_purchases', 'sfd_clicks',
        |                     'user_id', 'ts', 'click_ts', 'click_id')""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), "SQL text must hit the native exec:\n" + p)
    assert(!p.contains("Window") && !p.contains("Union"),
      "SQL path must not fall back to a composition:\n" + p)
  }

  test("SQL and DataFrame as-of front doors agree bit-for-bit") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT purchase_id, click_id
        |FROM graft_asof_join('sfd_purchases', 'sfd_clicks',
        |                     'user_id', 'ts', 'click_ts', 'click_id')""".stripMargin)
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val viaDf = graft.plans.NativeAsOfJoin.asOf(
        ev.filter($"event_type" === "purchase")
          .select($"event_id".as("purchase_id"), $"user_id", $"ts"),
        ev.filter($"event_type" === "click")
          .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id")),
        key = "user_id", leftTime = "ts", rightTime = "click_ts",
        payloadCols = Seq("click_id"))
      .select($"purchase_id", $"click_id")
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
  }

  test("'inner' mode through SQL drops unmatched rows; default is left outer") {
    registerViews()
    def run(mode: String) = spark.sql(
      s"""SELECT purchase_id, click_id
         |FROM graft_asof_join('sfd_purchases', 'sfd_clicks',
         |                     'user_id', 'ts', 'click_ts', 'click_id', '$mode')""".stripMargin)
    val outer = run("left")
    val inner = run("inner")
    assert(outer.count() >= inner.count())
    assert(inner.filter($"click_id".isNull).count() === 0)
    val matchedOuter = outer.filter($"click_id".isNotNull)
    assert(inner.exceptAll(matchedOuter).isEmpty && matchedOuter.exceptAll(inner).isEmpty)
  }

  test("tolerance through SQL (8th arg) == DataFrame within=, and bounds the lookback") {
    registerViews()
    val tol = 604800000000L // 7 days in micros
    val viaSql = spark.sql(
      s"""SELECT purchase_id, click_id
         |FROM graft_asof_join('sfd_purchases', 'sfd_clicks',
         |                     'user_id', 'ts', 'click_ts', 'click_id', 'left', $tol)""".stripMargin)
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val viaDf = graft.plans.NativeAsOfJoin.asOf(
        ev.filter($"event_type" === "purchase")
          .select($"event_id".as("purchase_id"), $"user_id", $"ts"),
        ev.filter($"event_type" === "click")
          .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id")),
        key = "user_id", leftTime = "ts", rightTime = "click_ts",
        payloadCols = Seq("click_id"), within = Some(tol))
      .select($"purchase_id", $"click_id")
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
    // the bound must actually null some matches the unbounded join keeps
    val unbounded = spark.sql(
      """SELECT purchase_id, click_id
        |FROM graft_asof_join('sfd_purchases', 'sfd_clicks',
        |                     'user_id', 'ts', 'click_ts', 'click_id')""".stripMargin)
    assert(viaSql.filter($"click_id".isNull).count() >
      unbounded.filter($"click_id".isNull).count(),
      "the 7-day bound should unmatch at least one purchase at sf0.001")
  }

  test("direction through SQL (9th arg) == DataFrame direction=") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT purchase_id, click_id
        |FROM graft_asof_join('sfd_purchases', 'sfd_clicks',
        |                     'user_id', 'ts', 'click_ts', 'click_id',
        |                     'left', 9223372036854775807, 'nearest')""".stripMargin)
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val viaDf = graft.plans.NativeAsOfJoin.asOf(
        ev.filter($"event_type" === "purchase")
          .select($"event_id".as("purchase_id"), $"user_id", $"ts"),
        ev.filter($"event_type" === "click")
          .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id")),
        key = "user_id", leftTime = "ts", rightTime = "click_ts",
        payloadCols = Seq("click_id"),
        direction = graft.plans.AsOfDirection.Nearest)
      .select($"purchase_id", $"click_id")
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
  }

  test("filters above the SQL TVF still push below the native node") {
    registerViews()
    val df = spark.sql(
      """SELECT purchase_id, click_id
        |FROM graft_asof_join('sfd_purchases', 'sfd_clicks',
        |                     'user_id', 'ts', 'click_ts', 'click_id')
        |WHERE purchase_id % 7 = 0""".stripMargin)
    val opt = df.queryExecution.optimizedPlan
    val node = opt.collectFirst { case a: graft.plans.AsOfJoinNode => a }
    assert(node.isDefined, "as-of node must survive optimization:\n" + opt)
    assert(node.get.left.collectFirst {
      case f: Filter if f.condition.toString.contains("% 7") => f
    }.nonEmpty, "left-only predicate must move into the left subtree:\n" + opt)
  }

  test("graft_interval_join SQL plans the native IntervalJoin exec and matches a range join") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), unix_micros($"ts").as("t"))
      .createOrReplaceTempView("sfd_points")
    ev.filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("window_id"),
        unix_micros($"ts").as("w_start"),
        (unix_micros($"ts") + round($"value" * 3600000000L).cast("long")).as("w_end"))
      .createOrReplaceTempView("sfd_windows")
    val viaSql = spark.sql(
      """SELECT click_id, window_id
        |FROM graft_interval_join('sfd_points', 'sfd_windows',
        |                         'user_id', 't', 'w_start', 'w_end', 'window_id')""".stripMargin)
    val p = viaSql.queryExecution.executedPlan.toString
    assert(p.contains("IntervalJoin"), "SQL text must hit the native exec:\n" + p)
    val oracle = spark.sql(
      """SELECT p.click_id, w.window_id
        |FROM sfd_points p JOIN sfd_windows w
        |  ON p.user_id = w.user_id AND p.t BETWEEN w.w_start AND w.w_end""".stripMargin)
    assert(viaSql.exceptAll(oracle).isEmpty && oracle.exceptAll(viaSql).isEmpty)
  }

  test("bad arguments fail loudly at SQL analysis time") {
    registerViews()
    val eMode = intercept[Exception] {
      spark.sql(
        """SELECT * FROM graft_asof_join('sfd_purchases', 'sfd_clicks',
          |  'user_id', 'ts', 'click_ts', 'click_id', 'full')""".stripMargin)
    }
    assert(eMode.getMessage.contains("'left' or 'inner'"), eMode.getMessage)
    val eCol = intercept[Exception] {
      spark.sql(
        """SELECT * FROM graft_asof_join('sfd_purchases', 'sfd_clicks',
          |  'user_id', 'ts', 'click_ts', 'no_such_col')""".stripMargin).collect()
    }
    assert(eCol.getMessage.contains("no_such_col"), eCol.getMessage)
  }
}
