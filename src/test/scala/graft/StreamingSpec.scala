package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec with QuietDeliberateErrors {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowedCounts over a MemoryStream matches the batch result") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Seq(
      Event(1L, 1L, ts("2024-01-01 00:01:00")),
      Event(1L, 2L, ts("2024-01-01 00:04:00")),
      Event(1L, 3L, ts("2024-01-01 00:11:00")),
      Event(2L, 4L, ts("2024-01-01 00:02:00")))

    val mem = MemoryStream[Event]
    mem.addData(rows: _*)
    val q = StreamingOps.windowedCounts(mem.toDF(), "ts", "user_id",
        "10 minutes", "10 minutes", "1 minute")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("wc")
      .select("user_id", "w_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    val batch = StreamingOps.windowedCounts(rows.toDF(), "ts", "user_id",
        "10 minutes", "10 minutes", "1 minute")
      .select("user_id", "w_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed == Set(
      (1L, "2024-01-01 00:00:00.0", 2L),
      (1L, "2024-01-01 00:10:00.0", 1L),
      (2L, "2024-01-01 00:00:00.0", 1L)))
  }

  test("streaming CMS cells equal the batch rebuild, incl. across batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = (1 to 40).map(i => Event(i.toLong % 7, i.toLong, ts("2024-01-01 00:01:00")))
    val mem = MemoryStream[Event]
    mem.addData(rows.take(20): _*) // two arrival batches: the sketch must
    val cms = graft.operators.CountMinSketch.build(mem.toDF(), "user_id",
      depth = 3, width = 64)
    val q = cms.writeStream.format("memory").queryName("cms_t")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      mem.addData(rows.drop(20): _*) // ...fold the second batch in
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cms_t").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.operators.CountMinSketch.build(rows.toDF(), "user_id",
        depth = 3, width = 64).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch, "stream-maintained sketch == batch rebuild")
  }

  test("session_window groups events within the gap") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Seq(
      Event(1L, 1L, ts("2024-01-01 00:00:00")),
      Event(1L, 2L, ts("2024-01-01 00:03:00")),  // 3 min later → same session
      Event(1L, 3L, ts("2024-01-01 00:20:00"))) // 17 min later → new session
    val mem = MemoryStream[Event]
    mem.addData(rows: _*)
    val q = StreamingOps.sessionWindows(mem.toDF(), "ts", "user_id",
        "5 minutes", "1 minute")
      .writeStream.format("memory").queryName("sw").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val sessions = spark.table("sw").select("n_events").collect().map(_.getLong(0)).sorted
    assert(sessions.toSeq == Seq(1L, 2L))
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions with strict-gap edges") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val gapMs = 60 * 1000L
    val batch1 = Seq(
      Event(1L, 1L, ts("2024-01-01 00:00:00")),
      Event(1L, 2L, ts("2024-01-01 00:01:00")),  // exactly gap → SAME session (strict >)
      Event(1L, 3L, ts("2024-01-01 00:10:00")),  // closes session 1 (2 events)
      Event(1L, 4L, ts("2024-01-01 00:20:00"))) // closes session 2 (1 event)
    val mem = MemoryStream[Event]
    mem.addData(batch1: _*)
    // AvailableNow: with ProcessingTimeTimeout the engine schedules
    // timeout-check batches forever, so processAllAvailable would never
    // see a quiescent stream — run to exhaustion and terminate instead
    val q = StreamingOps.sessionizeWithState(mem.toDS(), gapMs)
      .writeStream.format("memory").queryName("fs").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000L) finally q.stop()
    val closed = spark.table("fs").select("n_events").collect().map(_.getLong(0)).toSeq
    assert(closed == Seq(2L, 1L)) // session 3 (event 4) still open in state
  }

  test("streaming funnel emits each stage once, in order, across batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.TypedEvent
    val mem = MemoryStream[TypedEvent]
    mem.addData(
      TypedEvent(1L, "click", ts("2024-01-01 00:00:00")), // pre-view click: ignored
      TypedEvent(1L, "view", ts("2024-01-01 00:01:00")),
      TypedEvent(1L, "click", ts("2024-01-01 00:02:00")),
      TypedEvent(2L, "view", ts("2024-01-01 00:00:30")))
    val q = StreamingOps.funnelWithState(mem.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("ffs").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000L) finally q.stop()
    val r1 = spark.table("ffs").collect()
      .map(x => (x.getLong(0), x.getInt(1))).sorted.toSeq
    assert(r1 == Seq((1L, 1), (1L, 2), (2L, 1)))
    // more data: user 1 purchases (a fresh query replays the whole
    // memory stream — the purchase reach must now appear; the second
    // click is ignored because that stage is already passed)
    mem.addData(TypedEvent(1L, "purchase", ts("2024-01-01 00:03:00")),
      TypedEvent(1L, "click", ts("2024-01-01 00:04:00")))
    val q2 = StreamingOps.funnelWithState(mem.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("ffs2").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q2.awaitTermination(120000L) finally q2.stop()
    val r2 = spark.table("ffs2").collect()
      .map(x => (x.getLong(0), x.getInt(1))).sorted.toSeq
    assert(r2.contains((1L, 3)), s"purchase reach missing: $r2")
  }

  test("streaming as-of carries the latest click across real micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.AttrEvent
    val mem = MemoryStream[AttrEvent]
    val q = StreamingOps.asOfWithState(mem.toDS(), sourceType = "click",
        matchType = "purchase", withinUs = Some(30L * 60 * 1000000L)) // 30 min
      .writeStream.format("memory").queryName("asofs").outputMode("append")
      .start()
    try {
      // batch 1: only a click — no output, state = (100, t)
      mem.addData(AttrEvent(1L, 100L, "click", ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      assert(spark.table("asofs").count() === 0)
      // batch 2: purchase 10 min later matches batch 1's click (state
      // carry); a second purchase 40 min later misses the 30-min bound
      // and must NOT fall back to it; a click after both is inert here
      mem.addData(
        AttrEvent(1L, 200L, "purchase", ts("2024-01-01 00:10:00")),
        AttrEvent(1L, 201L, "purchase", ts("2024-01-01 00:40:00")),
        AttrEvent(1L, 101L, "click", ts("2024-01-01 00:50:00")))
      q.processAllAvailable()
      val r = spark.table("asofs").collect()
        .map(x => x.getLong(1) -> (if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
      assert(r === Map(200L -> 100L, 201L -> -1L), s"got $r")
      // batch 3: a purchase right after batch 2's click matches IT (the
      // newer click replaced the state), not the original
      mem.addData(AttrEvent(1L, 202L, "purchase", ts("2024-01-01 00:55:00")))
      q.processAllAvailable()
      val r3 = spark.table("asofs").collect()
        .map(x => x.getLong(1) -> (if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
      assert(r3(202L) === 101L, s"got $r3")
    } finally q.stop()
  }

  test("as-of late data: out-of-order batches never retract; an older click is ignored") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.AttrEvent
    val mem = MemoryStream[AttrEvent]
    val q = StreamingOps.asOfWithState(mem.toDS(), sourceType = "click",
        matchType = "purchase")
      .writeStream.format("memory").queryName("asoflate").outputMode("append")
      .start()
    try {
      mem.addData(
        AttrEvent(1L, 100L, "click", ts("2024-01-01 00:20:00")),
        AttrEvent(1L, 200L, "purchase", ts("2024-01-01 00:30:00")))
      q.processAllAvailable()
      // batch 2 arrives LATE and OUT OF ORDER: a click with an OLDER
      // timestamp than the stored one, a purchase whose event time
      // precedes every click, and a normal purchase — fed in one batch
      // in shuffled order
      mem.addData(
        AttrEvent(1L, 201L, "purchase", ts("2024-01-01 00:35:00")),
        AttrEvent(1L, 99L, "click", ts("2024-01-01 00:10:00")),
        AttrEvent(1L, 202L, "purchase", ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      val r = spark.table("asoflate").collect()
        .map(x => x.getLong(1) -> (if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
      // p200's batch-1 row is FINAL (append mode — nothing retracts it);
      // p201 matches the STORED click 100, not the late-but-older 99;
      // p202 (event time before any click) stays unmatched even though
      // clicks exist in state — as-of never matches forward
      assert(r === Map(200L -> 100L, 201L -> 100L, 202L -> -1L), s"got $r")
      // the late-older click must NOT have replaced state: a fresh
      // purchase still attributes to click 100
      mem.addData(AttrEvent(1L, 203L, "purchase", ts("2024-01-01 00:40:00")))
      q.processAllAvailable()
      val r3 = spark.table("asoflate").collect()
        .map(x => x.getLong(1) -> (if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
      assert(r3(203L) === 100L, s"got $r3")
    } finally q.stop()
  }

  test("as-of watermark eviction: state drops at the horizon, post-eviction purchase " +
      "gets null, and state size stays bounded (stateOperators)") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.AttrEvent
    val mem = MemoryStream[AttrEvent]
    val q = StreamingOps.asOfWithState(mem.toDS(), sourceType = "click",
        matchType = "purchase",
        watermarkDelay = Some("10 minutes"),
        evictAfterMs = Some(20L * 60 * 1000)) // evict 20 min after the stored click
      .writeStream.format("memory").queryName("asofevict").outputMode("append")
      .start()
    def stateRows: Long = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).map(_.stateOperators(0).numRowsTotal)
      .getOrElse(-1L)
    try {
      // user 1's click: state = 1 row; its eviction horizon is 00:20
      mem.addData(AttrEvent(1L, 100L, "click", ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      assert(stateRows === 1L, "one user in state")
      // user 2's click far ahead advances the watermark to 00:50 —
      // past user 1's horizon; the engine's no-data batch then fires
      // the event-time timeout and REMOVES user 1's pair
      mem.addData(AttrEvent(2L, 300L, "click", ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      assert(stateRows === 1L,
        s"user 1 evicted at the horizon, user 2 remains: ${stateRows}")
      // post-eviction purchase by user 1 (event time above the
      // watermark, so NOT late): null attribution — the old click is
      // gone, and there is no fallback
      mem.addData(AttrEvent(1L, 400L, "purchase", ts("2024-01-01 01:05:00")))
      q.processAllAvailable()
      val r = spark.table("asofevict").collect()
        .map(x => x.getLong(1) -> (if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
      assert(r === Map(400L -> -1L), s"got $r")
      // a LATE click (event time 00:30, far under the 00:50 watermark)
      // is dropped by the engine before the operator sees it: the next
      // purchase must still be unmatched, and state must not regrow
      // beyond the two live users
      mem.addData(AttrEvent(1L, 101L, "click", ts("2024-01-01 00:30:00")))
      q.processAllAvailable()
      mem.addData(AttrEvent(1L, 401L, "purchase", ts("2024-01-01 01:06:00")))
      q.processAllAvailable()
      val r2 = spark.table("asofevict").collect()
        .map(x => x.getLong(1) -> (if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
      assert(r2(401L) === -1L,
        s"a click older than the watermark must not resurrect attribution: $r2")
      assert(stateRows <= 2L, s"state stays bounded by live users: $stateRows")
    } finally q.stop()
  }

  test("funnel late data: a late stage event cannot rewrite history; state is one row " +
      "per user (stateOperators)") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.TypedEvent
    val mem = MemoryStream[TypedEvent]
    val q = StreamingOps.funnelWithState(mem.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("ffslate").outputMode("append")
      .start()
    try {
      mem.addData(
        TypedEvent(1L, "view", ts("2024-01-01 00:10:00")),
        TypedEvent(1L, "click", ts("2024-01-01 00:20:00")),
        TypedEvent(2L, "view", ts("2024-01-01 00:15:00")))
      q.processAllAvailable()
      // LATE batch: user 1's purchase carries an event time BEFORE the
      // recorded click (00:20) — the strictly-ordered funnel must
      // reject it across the batch boundary, exactly as it would
      // in-batch; a duplicate late view is ignored (stage passed)
      mem.addData(
        TypedEvent(1L, "purchase", ts("2024-01-01 00:15:00")),
        TypedEvent(1L, "view", ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      val r = spark.table("ffslate").collect()
        .map(x => (x.getLong(0), x.getInt(1))).sorted.toSeq
      assert(r === Seq((1L, 1), (1L, 2), (2L, 1)),
        s"no stage-3 reach from a late out-of-order purchase: $r")
      // an in-order purchase later completes the funnel — late data
      // delayed conversion, never corrupted it
      mem.addData(TypedEvent(1L, "purchase", ts("2024-01-01 00:30:00")))
      q.processAllAvailable()
      val r2 = spark.table("ffslate").collect()
        .map(x => (x.getLong(0), x.getInt(1))).sorted.toSeq
      assert(r2.contains((1L, 3)), s"got $r2")
      val stateRows = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).map(_.stateOperators(0).numRowsTotal)
        .getOrElse(-1L)
      assert(stateRows === 2L,
        s"one bounded state row per user, watermark-independent: $stateRows")
    } finally q.stop()
  }

  test("as-of eviction holds under ONGOING activity: a busy user cannot ride a " +
      "stale click past the horizon") {
    // hasTimedOut only fires for groups with a SILENT batch, and the
    // re-armed timeout slides forward — so the horizon must also be
    // enforced at processing time, or a user active in every batch
    // attributes to a click arbitrarily older than evictAfterMs
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.AttrEvent
    val mem = MemoryStream[AttrEvent]
    val q = StreamingOps.asOfWithState(mem.toDS(), sourceType = "click",
        matchType = "purchase",
        watermarkDelay = Some("10 minutes"),
        evictAfterMs = Some(20L * 60 * 1000))
      .writeStream.format("memory").queryName("asofbusy").outputMode("append")
      .start()
    def stateRows: Long = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).map(_.stateOperators(0).numRowsTotal)
      .getOrElse(-1L)
    try {
      // user 1 clicks at 00:00 (horizon 00:20); user 2's click at 01:00
      // pushes the NEXT batch's watermark to 00:50 — past the horizon
      mem.addData(AttrEvent(1L, 100L, "click", ts("2024-01-01 00:00:00")),
        AttrEvent(2L, 300L, "click", ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // user 1 purchases in the very next batch: the group HAS data, so
      // no timeout fires — the processing-time horizon check must null
      // the attribution and drop the pair anyway
      mem.addData(AttrEvent(1L, 400L, "purchase", ts("2024-01-01 01:05:00")))
      q.processAllAvailable()
      val r = spark.table("asofbusy").collect()
        .map(x => x.getLong(1) -> (if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
      assert(r === Map(400L -> -1L),
        s"busy user must not attribute past the horizon: $r")
      assert(stateRows <= 1L,
        s"user 1's stale pair dropped at processing time, only user 2 remains: $stateRows")
      // and staying busy never resurrects it
      mem.addData(AttrEvent(1L, 401L, "purchase", ts("2024-01-01 01:06:00")))
      q.processAllAvailable()
      val r2 = spark.table("asofbusy").collect()
        .map(x => x.getLong(1) -> (if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
      assert(r2(401L) === -1L, s"got $r2")
    } finally q.stop()
  }

  test("stream-static as-of via the native BROADCAST exec: stateless, cross-batch exact") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // streaming purchases, STATIC click dimension: no state store should
    // ever open — the static side is complete, each batch is final
    case class P(user_id: Long, purchase_id: Long, ts: java.sql.Timestamp)
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = mem.toDS().toDF("user_id", "purchase_id", "ts")
    val clicks = Seq(
      (1L, 100L, ts("2024-01-01 00:00:00")),
      (1L, 101L, ts("2024-01-01 00:30:00")),
      (2L, 102L, ts("2024-01-01 00:10:00"))
    ).toDF("user_id", "click_id", "cts").select($"user_id", $"click_id",
      $"cts")
    val joined = graft.plans.NativeAsOfJoin.asOf(purchases, clicks,
      key = "user_id", leftTime = "ts", rightTime = "cts",
      payloadCols = Seq("click_id"), broadcast = Some(true))
    assert(joined.isStreaming, "plan must stay a streaming plan")
    val q = joined.writeStream.format("memory").queryName("asof_static")
      .outputMode("append").start()
    try {
      mem.addData((1L, 200L, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      mem.addData((1L, 201L, ts("2024-01-01 00:45:00")),
        (2L, 202L, ts("2024-01-01 00:05:00")), // before user 2's click -> null
        (3L, 203L, ts("2024-01-01 09:00:00"))) // unknown user -> null
      q.processAllAvailable()
      val r = spark.table("asof_static").collect()
        .map(x => x.getLong(x.fieldIndex("purchase_id")) ->
          (if (x.isNullAt(x.fieldIndex("click_id"))) -1L
           else x.getLong(x.fieldIndex("click_id")))).toMap
      assert(r === Map(200L -> 100L, 201L -> 101L, 202L -> -1L, 203L -> -1L), s"got $r")
      // statelessness pin: the public progress API reports NO stateful
      // operators in any batch
      assert(q.recentProgress.nonEmpty &&
        q.recentProgress.forall(_.stateOperators.isEmpty),
        "broadcast as-of enrichment must run with zero state stores")
    } finally q.stop()
  }

  test("stream-static interval enrich via the BROADCAST exec: stateless, cross-batch exact") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // streaming points, STATIC window dimension — the X214 shape: like
    // the as-of sibling above, no state store should ever open
    val mem = MemoryStream[(Long, Long, Long)]
    val points = mem.toDS().toDF("user_id", "point_id", "t")
    val windows = Seq(
      (1L, 100L, 0L, 50L), (1L, 101L, 40L, 90L), (2L, 102L, 10L, 20L)
    ).toDF("user_id", "window_id", "w_start", "w_end")
    val joined = graft.plans.NativeIntervalJoin.contain(points, windows,
      key = "user_id", pointTime = "t", startCol = "w_start", endCol = "w_end",
      payloadCols = Seq("window_id"),
      joinType = org.apache.spark.sql.catalyst.plans.LeftOuter,
      broadcast = Some(true))
    assert(joined.isStreaming, "plan must stay a streaming plan")
    val q = joined.writeStream.format("memory").queryName("iv_static")
      .outputMode("append").start()
    try {
      mem.addData((1L, 200L, 45L)) // in both of user 1's windows
      q.processAllAvailable()
      mem.addData((2L, 201L, 15L), // in user 2's window
        (2L, 202L, 99L),           // outside every window -> null row
        (9L, 203L, 5L))            // unknown user -> null row
      q.processAllAvailable()
      val r = spark.table("iv_static").collect()
        .map(x => (x.getLong(x.fieldIndex("point_id")),
          if (x.isNullAt(x.fieldIndex("window_id"))) -1L
          else x.getLong(x.fieldIndex("window_id")))).toSeq.sorted
      assert(r === Seq((200L, 100L), (200L, 101L), (201L, 102L),
        (202L, -1L), (203L, -1L)), s"got $r")
      assert(q.recentProgress.nonEmpty &&
        q.recentProgress.forall(_.stateOperators.isEmpty),
        "broadcast interval enrichment must run with zero state stores")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch interval join") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val views = Seq(
      Event(1L, 10L, ts("2024-01-01 00:00:00")),
      Event(1L, 11L, ts("2024-01-01 01:00:00")),
      Event(2L, 12L, ts("2024-01-01 00:00:00")))
    val clicks = Seq(
      Event(1L, 20L, ts("2024-01-01 00:05:00")),  // joins view 10 only
      Event(1L, 21L, ts("2024-01-01 01:09:00")),  // joins views 10? (69min > 10) no; 11 yes
      Event(1L, 22L, ts("2024-01-01 01:10:00")),  // exactly at 11+10min bound → joins 11
      Event(2L, 23L, ts("2024-01-01 02:00:00"))) // outside any interval
    def shape(v: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) = (
      v.select(col("user_id"), col("event_id").as("view_id"), col("ts").as("v_ts")),
      c.select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts")))
    val memV = MemoryStream[Event]; memV.addData(views: _*)
    val memC = MemoryStream[Event]; memC.addData(clicks: _*)
    val (sv, sc) = shape(memV.toDF(), memC.toDF())
    val q = StreamingOps.intervalJoin(sv, sc, "user_id", "c_user", "v_ts", "c_ts",
        maxDelay = "10 minutes", watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("view_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = pairs(spark.table("ij"))
    val (bv, bc) = shape(views.toDF(), clicks.toDF())
    val batch = pairs(StreamingOps.intervalJoin(bv, bc, "user_id", "c_user",
      "v_ts", "c_ts", maxDelay = "10 minutes", watermarkDelay = "1 minute"))
    assert(streamed == batch)
    assert(streamed == Set((10L, 20L), (11L, 21L), (11L, 22L)))
  }

  test("streamingDedup emits one row per key with watermark-bounded state") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.streaming.StreamingOps.Doc
    val rows = Seq(
      Doc(1L, "a", ts("2024-01-01 00:01:00")),
      Doc(2L, "b", ts("2024-01-01 00:02:00")),
      Doc(3L, "a", ts("2024-01-01 00:03:00")), // dup of doc 1
      Doc(4L, "c", ts("2024-01-01 00:04:00")),
      Doc(5L, "b", ts("2024-01-01 00:05:00"))) // dup of doc 2
    val mem = MemoryStream[Doc]
    mem.addData(rows: _*)
    val q = StreamingOps.streamingDedup(mem.toDF(), "ts", "key", "10 minutes")
      .writeStream.format("memory").queryName("sd").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("sd").select("key").collect().map(_.getString(0)).toSeq
    assert(out.sorted == Seq("a", "b", "c")) // exactly one survivor per key
  }
}
