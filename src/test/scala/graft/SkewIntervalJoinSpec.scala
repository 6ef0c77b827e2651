package graft

import graft.operators.SkewIntervalJoin
import graft.plans.NativeIntervalJoin
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.functions._

/** The skew-safe bucketed interval join against the plain native
  * operator — the two must agree multiset-for-multiset on a synthetic
  * hot corpus with overlapping intervals, bucket-boundary-straddling
  * intervals, empty buckets, and the full null menagerie (null keys,
  * null times, null bounds, inverted bounds).
  */
class SkewIntervalJoinSpec extends SparkSpec with QuietDeliberateErrors {

  import spark.implicits._

  // one hot key ("H") with 3000 points over [0, 3000) in scrambled
  // order; intervals every 50 ticks spanning 120 (so each point sits in
  // up to 3 overlapping intervals and every interval straddles 2-3
  // buckets at width 50/100); an interval-free hole in [1400, 2100)
  // guards LeftOuter; a cold key plus nulls guard composite-key
  // semantics.
  private lazy val points = (
    (0 until 3000).map(i => (Some("H"), Some(i.toLong * 13 % 3000), i.toLong)) ++
      Seq((Some("c"), Some(60L), 9001L), (None, Some(10L), 9002L),
        (Some("H"), Option.empty[Long], 9003L))
    ).toDF("k", "t", "id")

  private lazy val intervals = (
    (0 until 3000 by 50).filterNot(s => s >= 1400 && s < 2100)
      .map(s => (Some("H"), Some(s.toLong), Some(s + 120L), s.toLong / 10)) ++
      Seq((Some("c"), Some(50L), Some(70L), -1L),
        (Some("c"), Option.empty[Long], Some(99L), -2L),   // null start
        (Some("H"), Some(500L), Option.empty[Long], -3L),  // null end
        (Some("H"), Some(900L), Some(800L), -4L),          // inverted
        (None, Some(1L), Some(2L), -5L))                   // null key
    ).toDF("k", "s", "e", "wid")

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Option[Long])] =
    df.select($"id", $"wid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq.sorted

  test("bucketed == plain native (Inner), widths aligned and not") {
    val plain = pairs(NativeIntervalJoin.contain(
      points, intervals, "k", "t", "s", "e", Seq("wid")))
    assert(plain.nonEmpty)
    Seq(100L, 37L, 5000L).foreach { w =>
      val bucketed = pairs(SkewIntervalJoin.containBucketed(
        points, intervals, "k", "t", "s", "e", Seq("wid"), bucketWidth = w))
      assert(bucketed === plain, s"width $w")
    }
  }

  test("bucketed == plain native (LeftOuter) — holes come back null, once") {
    val plain = pairs(NativeIntervalJoin.contain(
      points, intervals, "k", "t", "s", "e", Seq("wid"), joinType = LeftOuter))
    val bucketed = pairs(SkewIntervalJoin.containBucketed(
      points, intervals, "k", "t", "s", "e", Seq("wid"),
      bucketWidth = 100L, joinType = LeftOuter))
    assert(bucketed === plain)
    // the hole really exercises the outer path: points in (1520, 2100)
    // (past the last pre-hole interval's end) match nothing
    val holeIds = points.filter($"k" === "H" && $"t" > 1520 && $"t" < 2100)
      .select($"id").as[Long].collect().toSet
    assert(holeIds.nonEmpty)
    val matchedOf = bucketed.groupBy(_._1)
    holeIds.foreach { id =>
      assert(matchedOf(id) === Seq(id -> None), s"point $id must be null-padded once")
    }
  }

  test("replication bomb fails fast with the span in the message") {
    val bomb = Seq((Some("H"), Some(0L), Some(2999L), -9L)).toDF("k", "s", "e", "wid")
    val ex = intercept[Exception] {
      SkewIntervalJoin.containBucketed(points, bomb, "k", "t", "s", "e",
        Seq("wid"), bucketWidth = 10L, maxReplication = 100).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("widen bucketWidth")))
  }

  test("auto: hot corpus buckets, uniform corpus does not, small right broadcasts") {
    // 90% of points on one key → bucketed leg selected; the result must
    // still equal the plain operator's
    val (autoDf, dec) = SkewIntervalJoin.containAutoWithDecision(
      points, intervals, "k", "t", "s", "e", Seq("wid"),
      hotShareThreshold = 0.5, targetRowsPerBucket = 200L, allowBroadcast = false)
    assert(dec.usedBucketing && !dec.viaBroadcast)
    assert(dec.hotKeys === Seq("H"))
    // width clamped UP to the typical hot interval span (~120-ish >
    // density width 3000/ceil(3000/200)=200 → density wins here); just
    // pin it bounded and positive
    assert(dec.bucketWidth.exists(w => w >= 120L && w <= 3000L))
    assert(pairs(autoDf) === pairs(NativeIntervalJoin.contain(
      points, intervals, "k", "t", "s", "e", Seq("wid"))))

    val uniformPts = (0 until 300).map(i => (Some(s"k$i"), Some(i.toLong), i.toLong))
      .toDF("k", "t", "id")
    val (_, uniDec) = SkewIntervalJoin.containAutoWithDecision(
      uniformPts, intervals, "k", "t", "s", "e", Seq("wid"),
      hotShareThreshold = 0.05, allowBroadcast = false)
    assert(!uniDec.usedBucketing && !uniDec.viaBroadcast)

    val (_, bDec) = SkewIntervalJoin.containAutoWithDecision(
      points, intervals, "k", "t", "s", "e", Seq("wid"),
      hotShareThreshold = 0.5, allowBroadcast = true)
    assert(bDec.viaBroadcast && !bDec.usedBucketing)
  }

  test("randomized differential: bucketed and auto == plain on skewed corpora") {
    // seeded corpora with a zipf-ish hot key, NEGATIVE times (the
    // floor-division path pmod guards), inverted/null bounds, and spans
    // straddling many buckets; every (width × joinType) pairing must
    // reproduce the plain native operator's multiset exactly
    Seq(7L, 23L, 91L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      def key(): Option[String] =
        if (rnd.nextInt(20) == 0) None
        else if (rnd.nextInt(10) < 7) Some("H") else Some(s"k${rnd.nextInt(8)}")
      val pts = (0 until 1500).map { i =>
        val t = if (rnd.nextInt(25) == 0) None else Some(rnd.nextLong(10000L) - 5000L)
        (key(), t, seed * 1000000L + i)
      }.toDF("k", "t", "id")
      val ivs = (0 until 250).map { w =>
        val s0 = rnd.nextLong(10000L) - 5000L
        val span = rnd.nextLong(800L) - 40L // ~5% inverted
        val s = if (rnd.nextInt(30) == 0) None else Some(s0)
        val e = if (rnd.nextInt(30) == 0) None else Some(s0 + span)
        (key(), s, e, seed * 1000L + w)
      }.toDF("k", "s", "e", "wid")
      Seq(org.apache.spark.sql.catalyst.plans.Inner, LeftOuter).foreach { jt =>
        val plain = pairs(NativeIntervalJoin.contain(
          pts, ivs, "k", "t", "s", "e", Seq("wid"), joinType = jt))
        Seq(77L, 1000L).foreach { w =>
          val bucketed = pairs(SkewIntervalJoin.containBucketed(
            pts, ivs, "k", "t", "s", "e", Seq("wid"), bucketWidth = w, joinType = jt))
          assert(bucketed === plain, s"seed=$seed width=$w joinType=$jt")
        }
        val auto = pairs(SkewIntervalJoin.containAuto(
          pts, ivs, "k", "t", "s", "e", Seq("wid"), joinType = jt,
          hotShareThreshold = 0.3, targetRowsPerBucket = 100L,
          allowBroadcast = false))
        assert(auto === plain, s"seed=$seed auto joinType=$jt")
      }
    }
  }

  test("auto (LeftOuter) == plain across the hot/cold union") {
    val plain = pairs(NativeIntervalJoin.contain(
      points, intervals, "k", "t", "s", "e", Seq("wid"), joinType = LeftOuter))
    val auto = pairs(SkewIntervalJoin.containAuto(
      points, intervals, "k", "t", "s", "e", Seq("wid"), joinType = LeftOuter,
      hotShareThreshold = 0.5, targetRowsPerBucket = 200L, allowBroadcast = false))
    assert(auto === plain)
  }
}
