package graft

import graft.operators.SkewAsOfJoin
import graft.plans.NativeAsOfJoin
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.functions._

/** The skew-safe bucketed as-of against the plain native operator — the
  * two must agree row-for-row on a synthetic hot key whose left rows
  * span many buckets, including buckets with no right rows at all (the
  * carry-in must hop across the empty ones).
  */
class SkewAsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  // one hot key ("H") with 4000 left rows over [0, 4000); right rows
  // only every 97 ticks and NONE in [1000, 3000) — a 20-bucket hole at
  // width 100 that only the carry mechanism can bridge. A second cold
  // key ("c") and null keys/times guard the composite-key semantics.
  private lazy val left = (
    (0 until 4000).map(i => (Some("H"), Some(i.toLong * 7 % 4000), i.toLong)) ++
      Seq((Some("c"), Some(50L), 9001L), (None, Some(10L), 9002L),
        (Some("H"), Option.empty[Long], 9003L))
    ).toDF("k", "t", "id")

  private lazy val right = (
    (0 until 4000 by 97).filterNot(t => t >= 1000 && t < 3000)
      .map(t => (Some("H"), Some(t.toLong), t * 1.5)) ++
      Seq((Some("c"), Some(40L), -1.0), (Some("c"), Option.empty[Long], -2.0),
        (None, Some(1L), -3.0))
    ).toDF("k", "rt", "v")

  private def collectMap(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
    df.select($"id", $"v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

  test("bucketed == plain native on a hot key with empty-bucket gaps (outer)") {
    val plain = collectMap(NativeAsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v")))
    val bucketed = collectMap(SkewAsOfJoin.asOfBucketed(
      left, right, "k", "t", "rt", Seq("v"), bucketWidth = 100L))
    assert(bucketed.size === plain.size)
    assert(bucketed === plain)
    // sanity: the hole really exercises the carry — rows in [1000, 3000)
    // must match the last pre-hole tick, not null
    val inHole = left.filter($"t" >= 1000 && $"t" < 3000 && $"k" === "H")
      .select($"id").as[Long].collect()
    assert(inHole.nonEmpty && inHole.forall(id => bucketed(id).isDefined))
  }

  test("bucketed == plain under Inner and under tolerance") {
    val plainInner = collectMap(NativeAsOfJoin.asOf(
      left, right, "k", "t", "rt", Seq("v"), joinType = Inner))
    val bucketedInner = collectMap(SkewAsOfJoin.asOfBucketed(
      left, right, "k", "t", "rt", Seq("v"), bucketWidth = 100L, joinType = Inner))
    assert(bucketedInner === plainInner)
    val plainTol = collectMap(NativeAsOfJoin.asOf(
      left, right, "k", "t", "rt", Seq("v"), within = Some(60L)))
    val bucketedTol = collectMap(SkewAsOfJoin.asOfBucketed(
      left, right, "k", "t", "rt", Seq("v"), bucketWidth = 100L, within = Some(60L)))
    assert(bucketedTol === plainTol)
  }

  test("forward and nearest directions == plain native (mirror / double carry)") {
    import graft.plans.AsOfDirection
    Seq(AsOfDirection.Forward, AsOfDirection.Nearest).foreach { dir =>
      val plain = collectMap(NativeAsOfJoin.asOf(
        left, right, "k", "t", "rt", Seq("v"), direction = dir))
      Seq(37L, 100L, 5000L).foreach { w =>
        val b = collectMap(SkewAsOfJoin.asOfBucketed(
          left, right, "k", "t", "rt", Seq("v"), bucketWidth = w, direction = dir))
        assert(b === plain, s"dir=$dir width=$w")
      }
      val plainTol = collectMap(NativeAsOfJoin.asOf(
        left, right, "k", "t", "rt", Seq("v"), direction = dir, within = Some(60L)))
      val bTol = collectMap(SkewAsOfJoin.asOfBucketed(
        left, right, "k", "t", "rt", Seq("v"), bucketWidth = 100L,
        direction = dir, within = Some(60L)))
      assert(bTol === plainTol, s"dir=$dir with tolerance")
    }
  }

  test("bucket width not dividing the time range / width 1 / huge width all agree") {
    val plain = collectMap(NativeAsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v")))
    Seq(1L, 37L, 1000000L).foreach { w =>
      val b = collectMap(SkewAsOfJoin.asOfBucketed(
        left, right, "k", "t", "rt", Seq("v"), bucketWidth = w))
      assert(b === plain, s"width $w")
    }
  }

  test("asOfAuto: an 80%-hot corpus auto-selects bucketing and agrees with plain") {
    val (df, decision) = SkewAsOfJoin.asOfAutoWithDecision(
      left, right, "k", "t", "rt", Seq("v"),
      hotShareThreshold = 0.5, targetRowsPerBucket = 500L, allowBroadcast = false)
    assert(decision.usedBucketing, s"H holds ~100% of rows: $decision")
    assert(!decision.viaBroadcast)
    assert(decision.hotKeys === Seq("H"), "only the hot key routes through bucketing")
    // span 3999 / ceil(4000/500)=8 buckets -> width 499: the hot key is
    // genuinely split, not one bucket
    assert(decision.bucketWidth.exists(w => w >= 1 && w < 3999), s"width: $decision")
    assert(collectMap(df) === collectMap(
      NativeAsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v"))))
  }

  test("asOfAuto: a uniform corpus does NOT bucket — plain native path") {
    val uni = (0 until 4000).map(i => (s"k${i % 100}", i.toLong % 40, i.toLong))
      .toDF("k", "t", "id")
    val uniR = (0 until 100).map(i => (s"k${i}", 5L, i * 1.0)).toDF("k", "rt", "v")
    val (df, decision) = SkewAsOfJoin.asOfAutoWithDecision(
      uni, uniR, "k", "t", "rt", Seq("v"), allowBroadcast = false)
    assert(!decision.usedBucketing && !decision.viaBroadcast,
      s"max share is ~1%, far under the 10% default threshold: $decision")
    assert(decision.bucketWidth.isEmpty)
    assert(collectMap(df) === collectMap(
      NativeAsOfJoin.asOf(uni, uniR, "k", "t", "rt", Seq("v"))))
  }

  test("asOfAuto: a small right side short-circuits to the broadcast exec (no histogram)") {
    val (df, decision) = SkewAsOfJoin.asOfAutoWithDecision(
      left, right, "k", "t", "rt", Seq("v"))
    assert(decision.viaBroadcast && !decision.usedBucketing,
      s"tiny right under autoBroadcastJoinThreshold: $decision")
    assert(collectMap(df) === collectMap(
      NativeAsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v"))))
  }

  test("asOfAuto differentials: directions, tolerance and Inner through the auto route") {
    import graft.plans.AsOfDirection
    import org.apache.spark.sql.catalyst.plans.Inner
    for (dir <- Seq(AsOfDirection.Backward, AsOfDirection.Forward, AsOfDirection.Nearest);
         tol <- Seq(None, Some(60L))) {
      val plain = collectMap(NativeAsOfJoin.asOf(
        left, right, "k", "t", "rt", Seq("v"), direction = dir, within = tol))
      val (auto, decision) = SkewAsOfJoin.asOfAutoWithDecision(
        left, right, "k", "t", "rt", Seq("v"), direction = dir, within = tol,
        hotShareThreshold = 0.5, targetRowsPerBucket = 500L, allowBroadcast = false)
      assert(decision.usedBucketing, s"dir=$dir tol=$tol")
      assert(collectMap(auto) === plain, s"dir=$dir tol=$tol")
    }
    val plainInner = collectMap(NativeAsOfJoin.asOf(
      left, right, "k", "t", "rt", Seq("v"), joinType = Inner))
    val (autoInner, _) = SkewAsOfJoin.asOfAutoWithDecision(
      left, right, "k", "t", "rt", Seq("v"), joinType = Inner,
      hotShareThreshold = 0.5, targetRowsPerBucket = 500L, allowBroadcast = false)
    assert(collectMap(autoInner) === plainInner)
  }

  test("the hot key is actually split: > 1 partition-group for key H") {
    val df = SkewAsOfJoin.asOfBucketed(left, right, "k", "t", "rt", Seq("v"),
      bucketWidth = 100L)
    // observable contract: the composite join key is (k, bucket), so the
    // analyzed plan's as-of node carries two key columns
    val node = df.queryExecution.optimizedPlan.collectFirst {
      case a: graft.plans.AsOfJoinNode => a
    }.getOrElse(fail("AsOfJoinNode missing"))
    assert(node.leftKeys.length === 2, "composite (key, bucket) split")
  }
}
