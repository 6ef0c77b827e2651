package graft

import graft.operators.{Canonicalize, MinHashCalibration, ProportionTest, Sessionize}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Canonical selection (X174), minhash calibration (X175), capped
  * sessionization (X176), two-proportion z-test (X177).
  */
class CurationRound12Spec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("canonicalize: quality argmax per cluster, singletons keep themselves") {
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 50L), (4L, 7L)).toDF("doc_id", "q")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "component")
    val out = Canonicalize.assign(docs, comps, "doc_id", "q")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    // cluster {1,2,3}: 2 and 3 tie on quality 50 -> smallest id (2) wins
    assert(out(1L) === ((2L, false)))
    assert(out(2L) === ((2L, true)))
    assert(out(3L) === ((2L, false)))
    assert(out(4L) === ((4L, true)), "unclustered doc is its own canonical")
  }

  test("minhash calibration: identical docs estimate 1.0 with zero error") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (3L, "totally different words entirely here now okay yes")
    ).toDF("doc_id", "text")
    val out = MinHashCalibration.errorByEstimate(docs, n = 3, bands = 8, rowsPerBand = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Double]("mean_est"), r.getAs[Double]("mean_exact"),
          r.getAs[Double]("mean_abs_err"))).toMap
    assert(out.contains(32L), s"the exact dup must hit all 32 components: $out")
    assert(out(32L) === ((1L, 1.0, 1.0, 0.0)))
  }

  test("capped sessions split on duration, plain sessions split on gap only") {
    // one user, events every 100s for 1000s: one gap-session; cap 300s
    // slices it into ceil-style sub-sessions relative to the start
    val ev = (0 to 10).map(i => (1L, ts(i * 100L), i.toLong)).toDF("user_id", "ts", "event_id")
    val capped = Sessionize.sessionizeCapped(ev, "user_id", "ts",
        gapSeconds = 600, capSeconds = 300)
      .select($"event_id", $"session_seq", $"session_sub")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(capped.values.map(_._1).toSet === Set(1L), "one gap-session")
    assert(capped(0L)._2 === 0L && capped(2L)._2 === 0L)
    assert(capped(3L)._2 === 1L, "t=300 starts the second slice")
    assert(capped(10L)._2 === 3L, "t=1000 lands in slice 3")
  }

  test("two-proportion z: clear difference significant, identical rates not") {
    val clear = Seq(("a", 1000L, 600L), ("b", 1000L, 400L)).toDF("g", "n", "c")
    val r = ProportionTest.twoProportionZ(clear, "g", "n", "c").head()
    assert(r.getAs[Boolean]("significant"), "60% vs 40% at n=1000 is significant")
    assert(r.getAs[Double]("z") > 1.96)
    val same = Seq(("a", 1000L, 500L), ("b", 1000L, 500L)).toDF("g", "n", "c")
    val r2 = ProportionTest.twoProportionZ(same, "g", "n", "c").head()
    assert(!r2.getAs[Boolean]("significant"))
    assert(r2.getAs[Double]("z") === 0.0)
    // hand-check: p1=.6, p2=.4, pooled=.5 -> z = .2/sqrt(.25*.002) ~ 8.944
    assert(math.abs(r.getAs[Double]("z") - 8.944272) < 1e-5)
  }
}
