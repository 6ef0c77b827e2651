package graft

/** Plan-shape guards for the round-12 scale fixes: the bucketed
  * prefix-sum rewrites (X72, X75) must keep every corpus-touching
  * window PARTITIONED — only the ≤ nBuckets totals frame may see an
  * unpartitioned window — and the IVF-backed label audit must not
  * hardwire a corpus broadcast.
  */
class PlanSpecR12 extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf0001)
    df.queryExecution.executedPlan.toString
  }

  test("budget selection: the running total over the candidates is bucket-partitioned") {
    val p = plan("q_sample_budget")
    // the cum-cost window (orders by ratio) must carry the _bk partition;
    // the only unpartitioned window is the bucket-offset prefix (no ratio)
    val bad = p.linesIterator.filter(_.contains("windowspecdefinition("))
      .filter(_.contains("ratio")).filterNot(_.contains("_bk"))
    assert(bad.isEmpty,
      "unpartitioned corpus-wide window in budget plan:\n" + bad.mkString("\n"))
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast back onto the candidates:\n" + p)
  }

  test("quality blend: every signal's rank window is bucket-partitioned") {
    val p = plan("q_text_quality_blend")
    val bad = p.linesIterator.filter(_.contains("windowspecdefinition("))
      .filter(l => l.contains("s_chars") || l.contains("s_tok") || l.contains("s_distinct"))
      .filterNot(_.contains("_bk"))
    assert(bad.isEmpty,
      "unpartitioned corpus-wide rank window in blend plan:\n" + bad.mkString("\n"))
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast back onto the corpus:\n" + p)
  }

  test("retract: the extremum recompute reads only danger keys (semi join present)") {
    val p = plan("q_agg_incremental_retract")
    assert(p.contains("LeftSemi"),
      "remaining rows must be restricted to extremum-touching keys:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("link prediction: wedges come from equi-joins, never a cross product") {
    val p = plan("q_graph_link_prediction")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate pairs must be wedge equi-joins:\n" + p)
    assert(p.contains("LeftAnti"), "existing edges must leave via an anti-join:\n" + p)
  }

  test("ACF: every lag window is key-partitioned; one aggregate carries all lags") {
    val df = SparkEntry.queries("q_events_acf")(spark, TestSpark.sf0001)
    val p = df.queryExecution.executedPlan.toString
    val bad = p.linesIterator.filter(_.contains("windowspecdefinition("))
      .filterNot(_.contains("_k"))
    assert(bad.isEmpty, "unpartitioned lag window:\n" + bad.mkString("\n"))
  }

  test("capped sessions: both windows ride the user partitioning — one shuffle") {
    val df = SparkEntry.queries("q_sessionize_capped")(spark, TestSpark.sf0001)
    val p = df.queryExecution.executedPlan.toString
    val bad = p.linesIterator.filter(_.contains("windowspecdefinition("))
      .filterNot(_.contains("user_id"))
    assert(bad.isEmpty, "window not partitioned by user:\n" + bad.mkString("\n"))
  }

  test("manifest audit: one aggregate per layout, no joins") {
    val p = plan("q_diag_manifest_prune")
    assert(!p.contains("Join"), "the audit is a pure rollup:\n" + p)
  }

  test("IVF label audit: no broadcast of the corpus-sized probe frame") {
    val df = SparkEntry.queries("q_ml_label_agreement")(spark, TestSpark.sf0001)
    val analyzed = df.queryExecution.optimizedPlan.toString
    // centroids may broadcast (tiny); the probes frame (every corpus
    // vector) must not carry an explicit broadcast hint
    val hinted = analyzed.linesIterator.count(_.contains("ResolvedHint"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "no quadratic join in the IVF audit:\n" + p)
    assert(hinted <= 2, // centroid broadcast in assignment + probe halves only
      "unexpected broadcast hints in the IVF audit plan:\n" + analyzed)
  }
}
