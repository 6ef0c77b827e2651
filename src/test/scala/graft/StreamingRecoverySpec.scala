package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Checkpoint-recovery equivalence for the stateful streaming
  * operators: kill a `flatMapGroupsWithState` query after batch k,
  * restart from the SAME checkpoint (data kept arriving while it was
  * down), and pin that (a) the union of pre-stop and post-restart
  * output equals the uninterrupted run batch-for-batch, (b) the
  * recovered state actually carries (a post-restart event matches a
  * PRE-stop event — impossible unless state was restored), and
  * (c) state size stays bounded at one row per group. At 100 TB,
  * recovery correctness is as load-bearing as watermark discipline —
  * every long-running job WILL lose an executor or driver eventually.
  *
  * Sink: `foreachBatch` into a batchId-keyed map (the memory sink
  * refuses checkpoint recovery by design). Keying by batchId also
  * pins exactly-once delivery semantics: if restart re-runs the last
  * uncommitted batch, it lands on the SAME id — idempotent, exactly
  * the dedup contract a real exactly-once sink implements.
  */
class StreamingRecoverySpec extends SparkSpec with QuietDeliberateErrors {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of attribution state survives stop/restart from checkpoint") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.{AttrEvent, Attribution}
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_asof_").toString

    val batch1 = Seq(
      AttrEvent(1L, 100L, "click", ts("2024-01-01 00:00:00")),
      AttrEvent(1L, 200L, "purchase", ts("2024-01-01 00:10:00")),
      AttrEvent(2L, 110L, "click", ts("2024-01-01 00:05:00")))
    // arrives while the query is DOWN; purchase 201 can only attribute
    // to click 100 if batch-1 state was recovered from the checkpoint
    val batch2 = Seq(
      AttrEvent(1L, 201L, "purchase", ts("2024-01-01 00:20:00")),
      AttrEvent(2L, 210L, "purchase", ts("2024-01-01 00:30:00")),
      AttrEvent(2L, 111L, "click", ts("2024-01-01 00:40:00")))
    // post-restart batch: state keeps updating after recovery
    val batch3 = Seq(AttrEvent(2L, 211L, "purchase", ts("2024-01-01 00:45:00")))

    val mem = MemoryStream[AttrEvent]
    val sink = new scala.collection.concurrent.TrieMap[Long, Seq[String]]
    def start() =
      StreamingOps.asOfWithState(mem.toDS(), sourceType = "click", matchType = "purchase")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[Attribution], id: Long) =>
          sink.put(id, df.collect().map(_.productIterator.mkString("|")).toSeq); ()
        }
        .start()

    // run batch 1, then stop — the mid-stream kill
    val q1 = start()
    try { mem.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    val idsBeforeStop = sink.keySet.toSet
    val out1 = sink.values.flatten.toSeq.sorted

    mem.addData(batch2: _*) // data lands while the query is down

    // restart from the SAME checkpoint; drain the backlog + a live batch
    val q2 = start()
    val stateRows = try {
      q2.processAllAvailable()
      mem.addData(batch3: _*)
      q2.processAllAvailable()
      q2.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).map(_.stateOperators(0).numRowsTotal)
    } finally q2.stop()
    val out2 = sink.filterKeys(!idsBeforeStop.contains(_)).values.flatten.toSeq.sorted

    // the state-carry proof: purchase 201 attributed to pre-stop click 100
    assert(out2.exists(_.startsWith("1|201|Some(100)")),
      s"post-restart purchase must match the pre-stop click (recovered state): $out2")
    // ...and post-restart state updates still work (211 -> 111)
    assert(out2.exists(_.startsWith("2|211|Some(111)")), s"got $out2")
    // state bounded: one row per user, not one per event
    assert(stateRows.contains(2L), s"state must stay one row per group, got $stateRows")

    // uninterrupted reference over the SAME batch boundaries
    val memRef = MemoryStream[AttrEvent]
    val refSink = new scala.collection.concurrent.TrieMap[Long, Seq[String]]
    val qr = StreamingOps.asOfWithState(memRef.toDS(), "click", "purchase")
      .writeStream.outputMode("append")
      .foreachBatch { (df: Dataset[Attribution], id: Long) =>
        refSink.put(id, df.collect().map(_.productIterator.mkString("|")).toSeq); ()
      }
      .start()
    val ref = try {
      Seq(batch1, batch2, batch3).foreach { b =>
        memRef.addData(b: _*); qr.processAllAvailable()
      }
      refSink.values.flatten.toSeq.sorted
    } finally qr.stop()
    assert((out1 ++ out2).sorted == ref,
      s"stop+restart output must equal the uninterrupted run:\n" +
        s"got ${(out1 ++ out2).sorted}\nref $ref")
  }

  test("as-of recovery holds under the RocksDB state store (state beyond heap)") {
    // At 100 TB the keyed state of a long-running attribution job
    // outgrows executor heaps; Spark's answer is the RocksDB provider
    // (state on local SSD, incremental checkpoint uploads). The
    // operators must not care: same output, same recovery, same
    // bounded state — pinned here by re-running the stop/restart
    // sequence under RocksDB and checking its metrics actually flowed
    // (no silent fallback to the in-memory HDFS provider).
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.{AttrEvent, Attribution}
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_rocks_").toString
      val batch1 = Seq(
        AttrEvent(1L, 100L, "click", ts("2024-01-01 00:00:00")),
        AttrEvent(1L, 200L, "purchase", ts("2024-01-01 00:10:00")),
        AttrEvent(2L, 110L, "click", ts("2024-01-01 00:05:00")))
      val batch2 = Seq(
        AttrEvent(1L, 201L, "purchase", ts("2024-01-01 00:20:00")),
        AttrEvent(2L, 111L, "click", ts("2024-01-01 00:40:00")))
      val batch3 = Seq(AttrEvent(2L, 211L, "purchase", ts("2024-01-01 00:45:00")))

      val mem = MemoryStream[AttrEvent]
      val sink = new scala.collection.concurrent.TrieMap[Long, Seq[String]]
      def start() =
        StreamingOps.asOfWithState(mem.toDS(), sourceType = "click", matchType = "purchase")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: Dataset[Attribution], id: Long) =>
            sink.put(id, df.collect().map(_.productIterator.mkString("|")).toSeq); ()
          }
          .start()

      val q1 = start()
      try { mem.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
      mem.addData(batch2: _*) // lands while the query is down
      val q2 = start()
      val progress = try {
        q2.processAllAvailable()
        mem.addData(batch3: _*)
        q2.processAllAvailable()
        q2.recentProgress.reverse.find(_.stateOperators.nonEmpty)
      } finally q2.stop()
      val out = sink.values.flatten.toSeq.sorted

      // recovered-state carry across the RocksDB checkpoint restore
      assert(out.exists(_.startsWith("1|201|Some(100)")),
        s"post-restart purchase must match the pre-stop click under RocksDB: $out")
      assert(out.exists(_.startsWith("2|211|Some(111)")), s"got $out")
      val op = progress.map(_.stateOperators(0))
      assert(op.exists(_.numRowsTotal == 2L),
        s"state must stay one row per group, got ${op.map(_.numRowsTotal)}")
      // the provider proof: RocksDB custom metrics flowed through the
      // progress API — absent entirely under the default provider
      val metricKeys = op.map(_.customMetrics.keySet.toArray.map(_.toString).toSet)
        .getOrElse(Set.empty)
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"expected rocksdb custom metrics in state operator progress, got $metricKeys")
    } finally s.conf.unset(provKey)
  }

  test("funnel stage state survives stop/restart from checkpoint") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.{FunnelReach, TypedEvent}
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_funnel_").toString
    val stages = Seq("view", "click", "purchase")

    val batch1 = Seq(
      TypedEvent(1L, "view", ts("2024-01-01 00:01:00")),
      TypedEvent(1L, "click", ts("2024-01-01 00:02:00")),
      TypedEvent(2L, "view", ts("2024-01-01 00:03:00")))
    // while down: user 1 purchases — stage 3 is only reachable if the
    // recovered state remembers stages 1-2 were already passed
    val batch2 = Seq(
      TypedEvent(1L, "purchase", ts("2024-01-01 00:05:00")),
      TypedEvent(2L, "click", ts("2024-01-01 00:06:00")),
      TypedEvent(1L, "click", ts("2024-01-01 00:07:00"))) // replay: must NOT re-emit stage 2

    val mem = MemoryStream[TypedEvent]
    val sink = new scala.collection.concurrent.TrieMap[Long, Seq[(Long, Int)]]
    def start() =
      StreamingOps.funnelWithState(mem.toDS(), stages)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[FunnelReach], id: Long) =>
          sink.put(id, df.collect().map(r => (r.user_id, r.stage)).toSeq); ()
        }
        .start()

    val q1 = start()
    try { mem.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    val idsBeforeStop = sink.keySet.toSet
    val out1 = sink.values.flatten.toSeq.sorted
    assert(out1 == Seq((1L, 1), (1L, 2), (2L, 1)))

    mem.addData(batch2: _*)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val out2 = sink.filterKeys(!idsBeforeStop.contains(_)).values.flatten.toSeq.sorted
    // exactly the two NEW reaches: user 1 stage 3 (recovered state),
    // user 2 stage 2; the replayed click emits nothing (stage passed)
    assert(out2 == Seq((1L, 3), (2L, 2)),
      s"post-restart funnel must continue, not restart: $out2")

    // uninterrupted reference, same batch boundaries
    val memRef = MemoryStream[TypedEvent]
    val refSink = new scala.collection.concurrent.TrieMap[Long, Seq[(Long, Int)]]
    val qr = StreamingOps.funnelWithState(memRef.toDS(), stages)
      .writeStream.outputMode("append")
      .foreachBatch { (df: Dataset[FunnelReach], id: Long) =>
        refSink.put(id, df.collect().map(r => (r.user_id, r.stage)).toSeq); ()
      }
      .start()
    val ref = try {
      Seq(batch1, batch2).foreach { b => memRef.addData(b: _*); qr.processAllAvailable() }
      refSink.values.flatten.toSeq.sorted
    } finally qr.stop()
    assert((out1 ++ out2).sorted == ref,
      s"stop+restart funnel output must equal the uninterrupted run: " +
        s"got ${(out1 ++ out2).sorted} ref $ref")
  }
}
