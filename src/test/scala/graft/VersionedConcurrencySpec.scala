package graft

import graft.sources.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LIVE-THREAD concurrency for the versioned commit log — the CAS and
  * crash specs in VersionedTableSpec simulate races by pre-creating
  * version dirs; here the races are actually RUN: concurrent appenders
  * (optimistic retry — both must commit), appends racing a compact
  * (compact wins or fails loudly, never loses rows), readers planned
  * mid-storm (always a complete generation), and vacuum under load
  * (never eats an in-flight commit). Invariants asserted after every
  * storm: one winner per generation (the chain is contiguous), no row
  * lost or duplicated, and no orphaned files left behind once the
  * storm's survivors are vacuumed.
  */
class VersionedConcurrencySpec extends SparkSpec {

  private val tmpBase = System.getProperty("java.io.tmpdir")

  private def docs = Tables.load(spark, TestSpark.sf0001, "documents")
    .select(col("doc_id"), col("n_chars"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  /** v1 = the even doc_ids, under versioned management. */
  private def stageInit(tag: String): String = {
    val p = s"$tmpBase/graft_vcc_$tag"
    LocalFs.deleteRec(p)
    docs.filter(col("doc_id") % 2 === 0).coalesce(2).write.mode("overwrite").parquet(p)
    VersionedTable.init(spark, p, Seq("n_chars"))
    p
  }

  /** Run thunks on real threads behind a start barrier (maximal race
    * pressure), surfacing each outcome instead of dying on the thread.
    */
  private def inParallel[T](thunks: Seq[() => T]): Seq[Either[Throwable, T]] = {
    val barrier = new java.util.concurrent.CyclicBarrier(thunks.size)
    val results = new Array[Either[Throwable, T]](thunks.size)
    val ts = thunks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(() => {
        barrier.await()
        results(i) = try Right(t()) catch { case e: Throwable => Left(e) }
      })
      th.setDaemon(true)
      th
    }
    ts.foreach(_.start())
    ts.foreach(_.join(120000))
    // a racer that outlived the join timeout must surface as ITS OWN
    // failure, not as an NPE in the caller's fold over a null slot
    results.indices.foreach { i =>
      if (results(i) == null)
        results(i) = Left(new IllegalStateException(
          s"racer $i did not finish within the 120s join timeout"))
    }
    results.toSeq
  }

  test("two racing appenders both commit via optimistic retry; zero lost or duplicated rows") {
    val p = stageInit("race2")
    val a = docs.filter(col("doc_id") % 4 === 1)
    val b = docs.filter(col("doc_id") % 4 === 3)
    val res = inParallel(Seq(
      () => VersionedTable.append(a, p),
      () => VersionedTable.append(b, p)))
    val vs = res.map(_.fold(e => fail(s"racing appender must retry and commit, got: $e"), identity))
    // serialized: one took v2, the other (after losing the CAS) v3
    assert(vs.toSet == Set(2L, 3L), s"expected versions {2,3}, got $vs")
    assert(VersionedTable.versions(spark, p) == Seq(1L, 2L, 3L),
      "the generation chain must be contiguous - one winner per generation")
    assert(rows(VersionedTable.read(spark, p)) == rows(docs),
      "evens + both odd slices must land exactly once each")
  }

  test("appender storm with mid-storm readers: every read is a complete generation; chain deltas = batch sizes") {
    val p = stageInit("storm")
    val base = VersionedTable.read(spark, p).count()
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val sizes = Seq(1, 2, 3, 4) // distinct so each chain delta names its batch
    val batches = sizes.map(n => odds.limit(n))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readerErrors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => while (!stop.get()) {
      try {
        val c = VersionedTable.read(spark, p).count()
        assert(c >= base && c <= base + sizes.sum, s"mid-storm count $c out of range")
        reads.incrementAndGet()
      } catch { case e: Throwable => readerErrors.add(e); stop.set(true) }
    })
    reader.setDaemon(true)
    reader.start()
    val res = inParallel(batches.map(b => () => VersionedTable.append(b, p)))
    stop.set(true)
    reader.join(60000)
    assert(readerErrors.isEmpty,
      s"a reader planned mid-storm must always see a complete generation: ${readerErrors.peek()}")
    assert(reads.get() > 0, "the reader must actually have read mid-storm")
    res.foreach(r => r.left.foreach(e => fail(s"storm appender must commit, got: $e")))
    assert(VersionedTable.versions(spark, p) == (1L to 5L),
      "4 appenders over v1 must produce exactly v2..v5, one winner each")
    val counts = (1L to 5L).map(v => VersionedTable.snapshotAt(spark, p, v).count())
    val deltas = counts.sliding(2).map(w => w(1) - w(0)).toSeq
    assert(deltas.sorted == sizes.map(_.toLong).sorted,
      s"each generation must add exactly one batch (deltas $deltas vs sizes $sizes)")
    assert(counts.last == base + sizes.sum)
  }

  test("append vs compact race: compact wins or fails loudly; no rows lost either way") {
    val p = stageInit("cmp")
    val slices = Seq(1, 3, 5, 7).map(r => docs.filter(pmod(col("doc_id"), lit(8)) === r))
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val res = inParallel(Seq(
      () => slices.foreach(s => VersionedTable.append(s, p)),
      () => (1 to 4).foreach { _ =>
        try { VersionedTable.compact(spark, p, numFiles = 2); outcomes.add("win") }
        catch {
          case e: IllegalStateException if e.getMessage.contains("lost the commit race") =>
            outcomes.add("loss") // loud, stale generation orphaned - the documented contract
        }
        Thread.sleep(25)
      }))
    res.foreach(r => r.left.foreach(e => fail(s"unexpected racer failure: $e")))
    val vs = VersionedTable.versions(spark, p)
    assert(vs == (1L to vs.max), s"generation chain must stay contiguous, got $vs")
    assert(rows(VersionedTable.read(spark, p)) == rows(docs),
      s"all 4 appended slices must survive the compact race (outcomes: $outcomes)")
  }

  test("vacuum under racing appenders spares in-flight commits; a final vacuum leaves zero orphans") {
    val p = stageInit("vac")
    val slices = Seq(1, 3, 5).map(r => docs.filter(pmod(col("doc_id"), lit(8)) === r))
    val res = inParallel(
      slices.map(s => () => VersionedTable.append(s, p)) :+
        (() => (1 to 3).foreach { _ =>
          // default orphan grace: files staged by an in-flight append
          // are young and must survive this
          VersionedTable.vacuum(spark, p, keepLast = 2)
          Thread.sleep(20)
        }))
    res.foreach(r => r.left.foreach(e => fail(s"unexpected racer failure: $e")))
    val expected = rows(docs.filter(
      col("doc_id") % 2 === 0 || pmod(col("doc_id"), lit(8)).isin(1, 3, 5)))
    assert(rows(VersionedTable.read(spark, p)) == expected,
      "vacuum under load must never eat an in-flight commit's rows")
    // quiesced now: a full vacuum must reclaim everything unreferenced,
    // i.e. the storm leaked no permanently-orphaned data files
    VersionedTable.vacuum(spark, p, keepLast = 1, orphanGraceMs = 0)
    val cur = VersionedTable.currentVersion(spark, p).get
    val referenced = spark.read.parquet(s"$p/_graft_manifest/v$cur")
      .select(col("file")).collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    val onDisk = new java.io.File(p).listFiles().iterator
      .filter(f => f.isFile && f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(_.getName).toSet
    assert(onDisk == referenced,
      s"after a quiesced full vacuum, disk must hold exactly the current generation's files " +
        s"(extra: ${onDisk -- referenced}, missing: ${referenced -- onDisk})")
    assert(rows(VersionedTable.read(spark, p)) == expected)
  }
}
