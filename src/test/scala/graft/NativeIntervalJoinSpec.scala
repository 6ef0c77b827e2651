package graft

import graft.plans.NativeIntervalJoin
import org.apache.spark.sql.functions._

/** The native keyed interval-containment join (X173): hand-computed
  * expectations, equivalence with the relational range join, null and
  * dtype guards, plan shape, and the two-sided pushdown rule.
  */
class NativeIntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val points = Seq(
    ("A", 5L, 100L), ("A", 15L, 101L), ("A", 25L, 102L), ("A", 40L, 103L),
    ("B", 10L, 104L), ("C", 10L, 105L)
  ).toDF("k", "t", "pid")

  private lazy val intervals = Seq(
    ("A", 0L, 10L, 900L),   // catches t=5
    ("A", 10L, 30L, 901L),  // catches t=15, t=25
    ("A", 20L, 26L, 902L),  // overlapping: also catches t=25
    ("B", 50L, 60L, 903L),  // after B's point
    ("D", 0L, 99L, 904L)    // key with no points
  ).toDF("k", "s", "e", "wid")

  test("hand-computed matches: 1:N output, overlaps, misses, absent keys") {
    val got = NativeIntervalJoin.contain(points, intervals, key = "k",
        pointTime = "t", startCol = "s", endCol = "e", payloadCols = Seq("wid"))
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((100L, 900L), (101L, 901L), (102L, 901L), (102L, 902L)))
  }

  test("exec reports SQLMetrics: output rows, matched and unmatched points") {
    val df = NativeIntervalJoin.contain(points, intervals, key = "k",
      pointTime = "t", startCol = "s", endCol = "e", payloadCols = Seq("wid"),
      broadcast = Some(false)) // pin the sort-merge exec
    df.collect()
    val exec = TestSpark.findExec[graft.plans.IntervalJoinExec](df.queryExecution.executedPlan)
      .getOrElse(fail("IntervalJoinExec missing from the executed plan"))
    // 4 output rows (102 matches twice); points 100/101/102 matched;
    // 103 (after all A intervals), 104 (before B's), 105 (no C
    // intervals) unmatched
    assert(exec.metrics("numOutputRows").value === 4L)
    assert(exec.metrics("numMatchedPoints").value === 3L)
    assert(exec.metrics("numUnmatchedPoints").value === 3L)
  }

  test("left-outer mode keeps uncontained points with null payload; inner == outer minus nulls") {
    val outer = NativeIntervalJoin.contain(points, intervals, key = "k",
      pointTime = "t", startCol = "s", endCol = "e", payloadCols = Seq("wid"),
      joinType = org.apache.spark.sql.catalyst.plans.LeftOuter)
    val inner = NativeIntervalJoin.contain(points, intervals, key = "k",
      pointTime = "t", startCol = "s", endCol = "e", payloadCols = Seq("wid"))
    // every point appears at least once; 103/104/105 carry null wid
    val byPid = outer.select($"pid", $"wid").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(r =>
        if (r.isNullAt(1)) -1L else r.getLong(1)).toSet).toMap
    assert(byPid.keySet === Set(100L, 101L, 102L, 103L, 104L, 105L))
    assert(byPid(103L) === Set(-1L) && byPid(104L) === Set(-1L) && byPid(105L) === Set(-1L))
    assert(byPid(102L) === Set(901L, 902L), "matched points keep their 1:N rows")
    val matchedOuter = outer.filter($"wid".isNotNull)
    assert(inner.exceptAll(matchedOuter).isEmpty && matchedOuter.exceptAll(inner).isEmpty)
  }

  test("composite keys: containment stays inside the (k, zone) group; null key matches nothing") {
    val p = Seq(("A", "east", 15L, 1L), ("A", "west", 15L, 2L),
      (null.asInstanceOf[String], "east", 15L, 3L)).toDF("k", "zone", "t", "pid")
    val iv = Seq(("A", "east", 10L, 20L, 900L), ("A", "west", 0L, 5L, 901L))
      .toDF("k", "zone", "s", "e", "wid")
    val got = NativeIntervalJoin.containKeys(p, iv, keys = Seq("k", "zone"),
        pointTime = "t", startCol = "s", endCol = "e", payloadCols = Seq("wid"))
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pid 1 hits (A, east)'s [10,20]; pid 2's (A, west) interval ended
    // at 5; pid 3's null key matches nothing
    assert(got === Set((1L, 900L)))
  }

  test("closed ends: boundary instants match on both edges") {
    val p = Seq(("A", 10L, 1L), ("A", 30L, 2L)).toDF("k", "t", "pid")
    val got = NativeIntervalJoin.contain(p, intervals, "k", "t", "s", "e", Seq("wid"))
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // t=10 hits [0,10] AND [10,30]; t=30 hits [10,30]
    assert(got === Set((1L, 900L), (1L, 901L), (2L, 901L)))
  }

  test("null key/time/start/end never match") {
    val p = Seq((Some("A"), Some(5L), 1L), (None, Some(5L), 2L),
      (Some("A"), Option.empty[Long], 3L)).toDF("k", "t", "pid")
    val iv = Seq((Some("A"), Some(0L), Some(10L), 9L),
      (Some("A"), Option.empty[Long], Some(10L), 10L),
      (Some("A"), Some(0L), Option.empty[Long], 11L),
      (None, Some(0L), Some(10L), 12L)).toDF("k", "s", "e", "wid")
    val got = NativeIntervalJoin.contain(p, iv, "k", "t", "s", "e", Seq("wid"))
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 9L)))
  }

  test("equals the relational range join on the events fixture") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val p = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("pid"), unix_micros($"ts").as("t"))
    val iv = ev.filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("wid"), unix_micros($"ts").as("s"),
        (unix_micros($"ts") + round($"value" * 3600000000L).cast("long")).as("e"))
    val native = NativeIntervalJoin.contain(p, iv, "user_id", "t", "s", "e", Seq("wid"))
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val relational = p.join(iv, Seq("user_id"))
      .filter($"t" >= $"s" && $"t" <= $"e")
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native === relational)
    assert(native.nonEmpty, "fixture must actually exercise the merge")
  }

  test("dtype mismatches fail fast") {
    val p = Seq((1, 5L, 1L)).toDF("k", "t", "pid")
    val ivKey = Seq((1L, 0L, 10L, 9L)).toDF("k", "s", "e", "wid")
    val e1 = intercept[IllegalArgumentException] {
      NativeIntervalJoin.contain(p, ivKey, "k", "t", "s", "e", Seq("wid"))
    }
    assert(e1.getMessage.contains("key dtype mismatch"))
    val ivTime = Seq((1, 0, 10L, 9L)).toDF("k", "s", "e", "wid")
    val e2 = intercept[IllegalArgumentException] {
      NativeIntervalJoin.contain(p, ivTime, "k", "t", "s", "e", Seq("wid"))
    }
    assert(e2.getMessage.contains("time dtype mismatch"))
  }

  test("plan: IntervalJoin exec with one shuffle+sort per side, no explode") {
    val df = NativeIntervalJoin.contain(points, intervals, "k", "t", "s", "e", Seq("wid"),
      broadcast = Some(false))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("IntervalJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      "exactly one shuffle per side:\n" + p)
    assert(!p.contains("Generate") && !p.contains("CartesianProduct"),
      "no bucket explode, no cartesian:\n" + p)
  }

  test("broadcast exec: same results and metrics; ZERO exchange on the point side") {
    val df = NativeIntervalJoin.contain(points, intervals, key = "k",
      pointTime = "t", startCol = "s", endCol = "e", payloadCols = Seq("wid"),
      broadcast = Some(true))
    val rows = df.collect()
    val got = rows.map { r =>
      (r.getLong(r.fieldIndex("pid")), r.getLong(r.fieldIndex("wid")))
    }.toSet
    assert(got === Set((100L, 900L), (101L, 901L), (102L, 901L), (102L, 902L)))
    val exec = TestSpark.findExec[graft.plans.BroadcastIntervalJoinExec](
        df.queryExecution.executedPlan)
      .getOrElse(fail("BroadcastIntervalJoinExec missing from the executed plan"))
    assert(exec.metrics("numOutputRows").value === 4L)
    assert(exec.metrics("numMatchedPoints").value === 3L)
    assert(exec.metrics("numUnmatchedPoints").value === 3L)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      "no hash shuffle anywhere:\n" + p)
    assert(p.contains("BroadcastExchange"), "intervals ship via broadcast:\n" + p)
  }

  test("stats propagate: left-size-scaled, not the child-product visitor default") {
    val df = NativeIntervalJoin.contain(points, intervals, "k", "t", "s", "e", Seq("wid"))
    val st = df.queryExecution.optimizedPlan.stats
    val lSt = points.queryExecution.optimizedPlan.stats
    val fan = graft.plans.IntervalJoinNode.statsFanOut
    // scaled by the conservative 1:N fan-out factor (an under-estimate
    // would make upstream joins over-eager to broadcast this output),
    // but still left-row-linear — far below the child-product default
    assert(st.sizeInBytes >= lSt.sizeInBytes * fan &&
        st.sizeInBytes < lSt.sizeInBytes * fan * 4,
      s"interval-join stats must scale with the point side × fan-out: $st vs left $lSt")
    val rSt = intervals.queryExecution.optimizedPlan.stats
    assert(st.sizeInBytes < lSt.sizeInBytes * rSt.sizeInBytes,
      "and must be nowhere near the product visitor default")
  }

  test("broadcast == sort-merge on the events fixture, inner and outer") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val pts = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("pid"), unix_micros($"ts").as("t"))
    val ivs = ev.filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("wid"), unix_micros($"ts").as("s"),
        (unix_micros($"ts") + round($"value" * 3600000000L).cast("long")).as("e"))
    Seq(org.apache.spark.sql.catalyst.plans.Inner,
        org.apache.spark.sql.catalyst.plans.LeftOuter).foreach { jt =>
      val sm = NativeIntervalJoin.contain(pts, ivs, "user_id", "t", "s", "e",
        Seq("wid"), joinType = jt, broadcast = Some(false))
      val bc = NativeIntervalJoin.contain(pts, ivs, "user_id", "t", "s", "e",
        Seq("wid"), joinType = jt, broadcast = Some(true))
      assert(bc.exceptAll(sm).isEmpty && sm.exceptAll(bc).isEmpty,
        s"broadcast and sort-merge must agree row-for-row under $jt")
    }
  }

  test("pushdown: single-side filters sink below the node on both sides") {
    val df = NativeIntervalJoin.contain(points, intervals, "k", "t", "s", "e", Seq("wid"))
      .filter($"t" > 10L && $"wid" < 902L)
    val optimized = df.queryExecution.optimizedPlan.toString
    // after the rule, no Filter remains ABOVE the interval join node
    val lines = optimized.linesIterator.toSeq
    val joinIx = lines.indexWhere(_.contains("IntervalJoinNode"))
    assert(joinIx >= 0, optimized)
    assert(!lines.take(joinIx).exists(_.contains("Filter")),
      "both predicates must sink below the node:\n" + optimized)
    val got = df.select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((101L, 901L), (102L, 901L)), s"pushdown preserves semantics: $got")
  }
}
