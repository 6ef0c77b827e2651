package graft

/** Plan-quality regression guards: the properties that make these
  * queries viable at 100 TB, asserted against the actual physical plan
  * so a refactor that silently degrades the plan (lost pushdown, join
  * downgrade, window without group-limit) fails CI, not production.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf0001)
    df.queryExecution.executedPlan.toString
  }

  test("revenue rollup: broadcast dims, pruned lineitem scan, no cartesian") {
    val p = plan("q_join_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), "dims should broadcast")
    assert(!p.contains("CartesianProduct"), "no cartesian product")
    assert(!p.contains("SortMergeJoin"), "no sort-merge at dim sizes")
    // lineitem scan must prune to the 3 needed columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
      "lineitem scan not pruned:\n" + p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("top-k per group plans a WindowGroupLimit below the shuffle") {
    val p = plan("q_window_rank_topk_orders")
    assert(p.contains("WindowGroupLimit"), "rank<=k filter should push a group limit")
  }

  test("global top-n with LIMIT plans TakeOrderedAndProject") {
    val p = plan("q_limit_top_orders")
    assert(p.contains("TakeOrderedAndProject"), "orderBy+limit should not global-sort")
  }

  test("anti-join stays a real anti-join (no outer+filter emulation)") {
    val p = plan("q_join_anti_no_big_order")
    assert(p.contains("LeftAnti"), "should plan LeftAnti")
  }

  test("brute-force ANN broadcasts the query side only") {
    val p = plan("q_ann_brute_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side should broadcast")
    assert(!p.contains("CartesianProduct"), "corpus must stream, not cartesian-shuffle")
  }

  test("date grid generates without any exchange (pure generators)") {
    val df = graft.sources.DateGrid.dateHourGrid(spark, Seq(1996))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "grid generation must not shuffle:\n" + p)
  }
}
