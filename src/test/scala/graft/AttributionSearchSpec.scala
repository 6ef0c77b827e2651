package graft

import graft.operators.{CohortLtv, MultiTouchAttribution, PhraseSearch}
import org.apache.spark.sql.functions._

class MultiTouchAttributionSpec extends SparkSpec {

  test("credit splits exactly, remainder to most recent; window edges inclusive") {
    val s = spark; import s.implicits._
    // purchase at t=1000, value 10 µs; clicks at 999, 500, 0 (gap 1000 = L: in);
    // click at t=1001 (future) and user 2's click: out
    val conv = Seq((100L, 1L, 1000L, 10L)).toDF("pid", "user", "pus", "val_us")
    val touch = Seq(
      (1L, 11L, 999L), (1L, 12L, 500L), (1L, 13L, 0L),
      (1L, 14L, 1001L), (2L, 15L, 999L)
    ).toDF("user", "cid", "cus")
    val got = MultiTouchAttribution.linearCredit(conv, touch, keyCol = "user",
        convIdCol = "pid", convTsUs = "pus", touchTsUs = "cus",
        valueUsCol = "val_us", lookbackUs = 1000L)
      .select("cid", "credit_us").as[(Long, Long)].collect().toMap
    // 10 div 3 = 3, rem 1 → most recent click (cid 11, gap 1) gets 4
    assert(got == Map(11L -> 4L, 12L -> 3L, 13L -> 3L))
    assert(got.values.sum == 10L)
  }

  test("pairing is a bucketed equi-join — no nested loop over users") {
    val s = spark; import s.implicits._
    val conv = Seq((1L, 1L, 5000L, 100L)).toDF("pid", "user", "pus", "val_us")
    val touch = Seq((1L, 2L, 4000L)).toDF("user", "cid", "cus")
    val p = MultiTouchAttribution.linearCredit(conv, touch, "user", "pid",
        "pus", "cus", "val_us", lookbackUs = 1000L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "lookback pairing must ride the bucket equi-join:\n" + p)
  }
}

class CohortLtvSpec extends SparkSpec {

  test("revenue lands in the right cohort/age cell and accumulates") {
    val s = spark; import s.implicits._
    val wk = 7L * 86400L * 1000000L
    val ev = Seq(
      // user 1 signs up week 0, buys week 0 (2.0) and week 2 (3.0)
      (1L, "signup", 0L, 0.0), (1L, "purchase", wk / 2, 2.0),
      (1L, "purchase", 2 * wk + 1, 3.0),
      // user 2 signs up week 1, buys week 1 (5.0); pre-signup buy excluded
      (2L, "purchase", wk - 1, 9.0), (2L, "signup", wk, 0.0),
      (2L, "purchase", wk + 5, 5.0),
      // user 3 never signs up → excluded
      (3L, "purchase", 0L, 7.0)
    ).toDF("user_id", "event_type", "us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val rows = CohortLtv.weeklyLtv(ev, "user_id", "event_type", "ts", "value")
      .orderBy("cohort_week", "age_weeks").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows == Map(
      (0L, 0L) -> (1L, 2000000L, 2000000L),
      (0L, 2L) -> (1L, 3000000L, 5000000L),
      (1L, 0L) -> (1L, 5000000L, 5000000L)))
  }
}

class PhraseSearchSpec extends SparkSpec {

  test("finds adjacent in-order occurrences only, counts repeats, caps at k") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "big data big data big"),   // "big data" ×2
      (2L, "data big"),                // reversed → no match
      (3L, "big x data"),              // gap → no match
      (4L, "big data")                 // ×1
    ).toDF("doc_id", "text")
    val got = PhraseSearch.search(docs, Seq("big", "data"), k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (4L, 1L)))
  }

  test("three-word phrases chain the posting joins") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b c d a b c"),  // "a b c" ×2
      (2L, "a b x c")
    ).toDF("doc_id", "text")
    val got = PhraseSearch.search(docs, Seq("a", "b", "c"), k = 5)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }
}
