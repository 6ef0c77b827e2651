package graft

import graft.operators.{GrowthAccounting, Ohlc}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** OHLC bars (X156) and growth accounting (X157). */
class GrowthOhlcSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("OHLC: open/close follow time order, not value order") {
    val ev = Seq(
      (1L, ts(10), 5.0), (1L, ts(20), 9.0), (1L, ts(30), 1.0), (1L, ts(40), 7.0),
      (1L, ts(110), 2.0), // next bucket
      (2L, ts(15), 3.0)
    ).toDF("user_id", "ts", "value")
    val bars = Ohlc.bars(ev, "user_id", "ts", "value", bucketUs = 100L * 1000000L)
      .collect().map(r => (r.getAs[Long]("key"), r.getAs[Long]("bucket")) ->
        ((r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"),
          r.getAs[Double]("close"), r.getAs[Long]("n"), r.getAs[Double]("v_sum")))).toMap
    assert(bars((1L, 0L)) === ((5.0, 9.0, 1.0, 7.0, 4L, 22.0)))
    assert(bars((1L, 1L)) === ((2.0, 2.0, 2.0, 2.0, 1L, 2.0)))
    assert(bars((2L, 0L)) === ((3.0, 3.0, 3.0, 3.0, 1L, 3.0)))
  }

  test("OHLC: duplicate boundary timestamps break ties deterministically") {
    // two rows at the opening instant and two at the closing instant:
    // open takes the SMALLEST value, close the LARGEST, on any engine
    val ev = Seq(
      (1L, ts(10), 7.0), (1L, ts(10), 3.0), (1L, ts(20), 5.0),
      (1L, ts(30), 2.0), (1L, ts(30), 9.0)
    ).toDF("user_id", "ts", "value")
    val bar = Ohlc.bars(ev, "user_id", "ts", "value", bucketUs = 100L * 1000000L)
      .collect().head
    assert(bar.getAs[Double]("open") === 3.0, "open tie -> min value")
    assert(bar.getAs[Double]("close") === 9.0, "close tie -> max value")
    assert(bar.getAs[Long]("n") === 5L)
  }

  test("OHLC plans as one aggregate over one shuffle — no window, no join") {
    val p = Ohlc.bars(Tables.load(spark, TestSpark.sf0001, "events"),
        "user_id", "ts", "value", bucketUs = 604800000000L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window") && !p.contains("Join"),
      "bars must be a pure groupBy:\n" + p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("growth accounting: new, retained, resurrected, churned classify correctly") {
    val week = 100L
    def at(w: Long) = ts(w * week + 1)
    val ev = Seq(
      (1L, at(0)), (1L, at(1)), (1L, at(2)),            // steady: new then retained
      (2L, at(0)), (2L, at(2)),                          // skips week 1: resurrected at 2
      (3L, at(0)),                                       // one-and-done: churned at 1
      (4L, at(1))                                        // joins late
    ).toDF("user_id", "ts")
    val got = GrowthAccounting.report(ev.withColumn("v", lit(0)), "user_id", "ts",
        periodUs = week * 1000000L)
      .collect().map(r => r.getAs[Long]("period") ->
        ((r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
          r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned"),
          r.getAs[Long]("n_active")))).toMap
    // w0: users 1,2,3 new. w1: 1 retained, 4 new; 2 paused + 3 gone -> churned 2.
    // w2: 1 retained, 2 resurrected; 4 churned.
    assert(got(0L) === ((3L, 0L, 0L, 0L, 3L)))
    assert(got(1L) === ((1L, 1L, 0L, 2L, 2L)))
    assert(got(2L) === ((0L, 1L, 1L, 1L, 2L)))
    assert(got.size === 3, "no phantom post-horizon periods")
  }

  test("growth accounting: a fully-inactive period still reports its churn") {
    val week = 100L
    def at(w: Long) = ts(w * week + 1)
    // both users active in w0 only/with a gap: w1 has ZERO activity but
    // owns two churn events — a left join from `active` would drop it
    val ev = Seq((1L, at(0)), (2L, at(0)), (2L, at(3))).toDF("user_id", "ts")
    val got = GrowthAccounting.report(ev.withColumn("v", lit(0)), "user_id", "ts",
        periodUs = week * 1000000L)
      .collect().map(r => r.getAs[Long]("period") ->
        ((r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
          r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned"),
          r.getAs[Long]("n_active")))).toMap
    assert(got(1L) === ((0L, 0L, 0L, 2L, 0L)), s"gap period keeps its churn row: $got")
    assert(got(0L) === ((2L, 0L, 0L, 0L, 2L)))
    assert(got(3L) === ((0L, 0L, 1L, 0L, 1L)))
    assert(!got.contains(2L), "periods with neither activity nor churn stay absent")
  }
}
