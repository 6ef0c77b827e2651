package graft

import graft.plans.{ManifestPrunedFileIndex, VersionKeepFileIndex}
import graft.sources.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Versioned manifest commits (graft.sources.VersionedTable): every
  * mutation is a new generation + an atomic pointer flip, so readers
  * are never mid-rewrite — compaction is atomic under concurrent
  * readers, old versions stay addressable (time travel), crashes
  * leave the previous version intact, and vacuum reclaims what no
  * kept generation references.
  */
class VersionedTableSpec extends SparkSpec {

  private val tmpBase = System.getProperty("java.io.tmpdir")

  private def docs = Tables.load(spark, TestSpark.sf0001, "documents")
    .select(col("doc_id"), col("n_chars"))

  private def scanIndex(df: DataFrame) =
    TestSpark.findExec[FileSourceScanExec](df.queryExecution.executedPlan)
      .getOrElse(fail("no FileSourceScanExec in the executed plan"))
      .relation.location

  private def dataFilesOnDisk(path: String): Set[String] =
    new java.io.File(path).listFiles().iterator
      .filter(f => f.isFile && f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(_.getName).toSet

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  /** Fresh versioned table: v1 = even doc_ids (8 hash-sliced small
    * files, the stream-shaped worst case), v2 = +odd doc_ids.
    */
  private def stage(tag: String): String = {
    val p = s"$tmpBase/graft_vtab_$tag"
    LocalFs.deleteRec(p)
    (0 until 8).foreach { i =>
      docs.filter(col("doc_id") % 2 === 0 && pmod(col("doc_id"), lit(16)) === i * 2)
        .coalesce(1).write.mode("append").parquet(p)
    }
    VersionedTable.init(spark, p, Seq("n_chars"))
    VersionedTable.append(docs.filter(col("doc_id") % 2 === 1), p)
    p
  }

  test("init + append commit versions; read sees the current snapshot") {
    val p = stage("basic")
    assert(VersionedTable.versions(spark, p) == Seq(1L, 2L))
    assert(VersionedTable.currentVersion(spark, p).contains(2L))
    assert(rows(VersionedTable.read(spark, p)) == rows(docs))
    // the read plans over the keep-index (single root, composable shape)
    val idx = scanIndex(VersionedTable.read(spark, p))
    assert(idx.isInstanceOf[VersionKeepFileIndex] ||
      idx.isInstanceOf[ManifestPrunedFileIndex])
  }

  test("compact is atomic under a concurrent reader; old files survive until vacuum") {
    val p = stage("atomic")
    val preFiles = dataFilesOnDisk(p)
    // a reader PLANS before the compact lands...
    val planned = VersionedTable.read(spark, p)
    val (before, after) = VersionedTable.compact(spark, p, numFiles = 2,
      orderBy = Some("n_chars"))
    assert(before > 2 && after == 2, s"compact must shrink: $before -> $after")
    // ...and still reads its complete pinned version mid-compaction
    assert(rows(planned) == rows(docs),
      "a pre-compact reader must see its full version, not a mid-rewrite state")
    // the new current is the compacted generation, same content
    assert(VersionedTable.currentVersion(spark, p).contains(3L))
    assert(rows(VersionedTable.read(spark, p)) == rows(docs))
    // nothing was deleted: the old generation's files are all still there
    assert(preFiles.subsetOf(dataFilesOnDisk(p)),
      "compact must not delete old generation files (vacuum does)")
    // vacuum keeping only the newest generation reclaims them
    val (deleted, dropped) = VersionedTable.vacuum(spark, p, keepLast = 1)
    assert(deleted == preFiles.size && dropped == 2,
      s"vacuum must drop v1+v2 and their $deleted files (got $deleted/$dropped)")
    assert(rows(VersionedTable.read(spark, p)) == rows(docs))
    assert(dataFilesOnDisk(p).size == 2)
  }

  test("snapshotAt time-travels to an old generation") {
    val p = stage("tt")
    VersionedTable.compact(spark, p, numFiles = 2, orderBy = Some("n_chars"))
    assert(rows(VersionedTable.snapshotAt(spark, p, 1)) ==
      rows(docs.filter(col("doc_id") % 2 === 0)), "v1 = evens only")
    assert(rows(VersionedTable.snapshotAt(spark, p, 2)) == rows(docs), "v2 = all")
    assert(rows(VersionedTable.snapshotAt(spark, p, 3)) == rows(docs), "v3 = compacted all")
    intercept[IllegalArgumentException](VersionedTable.snapshotAt(spark, p, 99))
  }

  test("crash sequencing: uncommitted data files are invisible; lost pointer resolves to max generation") {
    val p = stage("crash")
    // simulate a crash after the data write but before the commit:
    // stray files in the root belong to no manifest -> no version sees
    // them (the KEEP polarity of VersionKeepFileIndex)
    docs.limit(25).coalesce(1).write.mode("append").parquet(p)
    assert(rows(VersionedTable.read(spark, p)) == rows(docs),
      "orphaned (uncommitted) data files must stay invisible to versioned reads")
    // simulate a crash inside the pointer swap window: pointer absent
    // -> currentVersion falls back to the newest committed generation
    assert(new java.io.File(s"$p/${VersionedTable.PointerName}").delete())
    assert(VersionedTable.currentVersion(spark, p).contains(2L),
      "missing pointer must resolve to the max committed generation")
    assert(rows(VersionedTable.read(spark, p)) == rows(docs))
  }

  test("wedge recovery: a committed-but-unflipped generation is adopted, not a permanent CAS conflict") {
    val p = stage("wedge")
    // simulate a crash BETWEEN the generation rename and the pointer
    // flip: v3 is a fully committed manifest dir (the rename — the
    // atomic commit point — completed), but the pointer still names v2
    val v2 = new java.io.File(s"$p/_graft_manifest/v2")
    val v3 = new java.io.File(s"$p/_graft_manifest/v3")
    assert(v3.mkdirs())
    v2.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(v3, f.getName).toPath)
    }
    // readers adopt the committed generation (pointer = hint, not truth)
    assert(VersionedTable.currentVersion(spark, p).contains(3L),
      "a complete generation above the pointer IS committed and must resolve as current")
    assert(rows(VersionedTable.read(spark, p)) == rows(docs))
    // and the writer is NOT wedged: the next append targets v4 (no
    // rename-CAS conflict against the orphan) and heals the pointer
    assert(VersionedTable.append(docs.limit(5), p) == 4L)
    assert(VersionedTable.currentVersion(spark, p).contains(4L))
    assert(VersionedTable.read(spark, p).count() == docs.count() + 5)
    VersionedTable.vacuum(spark, p, keepLast = 1, orphanGraceMs = 0)
    assert(VersionedTable.read(spark, p).count() == docs.count() + 5)
  }

  test("flat-manifest write ops refuse a versioned root before touching it") {
    val p = stage("guard")
    import graft.sources.ManifestScan
    val before = dataFilesOnDisk(p)
    val e = intercept[IllegalArgumentException](
      ManifestScan.writeAppend(docs.limit(1), p, Seq("n_chars")))
    assert(e.getMessage.contains("VersionedTable"),
      s"the refusal must point at the versioned API, got: ${e.getMessage}")
    intercept[IllegalArgumentException](
      ManifestScan.refreshManifest(spark, p, Seq("n_chars")))
    intercept[IllegalArgumentException](
      ManifestScan.buildManifest(spark, p, Seq("n_chars")))
    intercept[IllegalArgumentException](
      ManifestScan.compact(spark, p, Seq("n_chars"), numFiles = 1))
    // the writeAppend guard fired BEFORE the data write: nothing landed
    assert(dataFilesOnDisk(p) == before,
      "a refused flat writeAppend must not have landed data files")
    assert(rows(VersionedTable.read(spark, p)) == rows(docs))
  }

  test("commit CAS: a pre-existing version dir fails the committer fast, table intact") {
    val p = stage("cas")
    // a concurrent committer already holds v3
    assert(new java.io.File(s"$p/_graft_manifest/v3").mkdirs())
    intercept[IllegalStateException] {
      VersionedTable.append(docs.limit(5), p)
    }
    // loser's generation discarded, winner's (empty stand-in) untouched,
    // current still resolves through the pointer to v2
    assert(VersionedTable.currentVersion(spark, p).contains(2L))
    assert(rows(VersionedTable.read(spark, p)) == rows(docs))
  }

  test("static file skipping composes on versioned reads") {
    val p = stage("skip")
    VersionedTable.compact(spark, p, numFiles = 4, orderBy = Some("n_chars"))
    val df = VersionedTable.read(spark, p)
      .filter(col("n_chars") >= 200L && col("n_chars") <= 300L)
    val idx = scanIndex(df)
    assert(idx.isInstanceOf[ManifestPrunedFileIndex],
      s"the static rule must wrap the versioned keep-index, got ${idx.getClass.getSimpleName}")
    val read = idx.listFiles(Nil, Nil).map(_.files.size).sum
    assert(read > 0 && read < 4, s"range over 4 clustered files must prune, read $read")
    assert(rows(df) == rows(docs.filter(col("n_chars").between(200, 300))))
  }

  test("SQL time travel: graft_snapshot TVF reads a retained generation") {
    val p = stage("sqltt")
    VersionedTable.compact(spark, p, numFiles = 2, orderBy = Some("n_chars"))
    graft.plans.GraftTables.register("vtab_sqltt", p)
    assert(rows(spark.sql("SELECT doc_id, n_chars FROM graft_snapshot('vtab_sqltt', 1)")) ==
      rows(docs.filter(col("doc_id") % 2 === 0)), "v1 = evens only")
    assert(rows(spark.sql("SELECT doc_id, n_chars FROM graft_snapshot('vtab_sqltt', 3)")) ==
      rows(docs), "v3 = compacted all")
    // current-version SQL identity agrees with the latest snapshot
    assert(rows(spark.sql("SELECT doc_id, n_chars FROM graft.vtab_sqltt")) == rows(docs))
    val bad = intercept[Exception] {
      spark.sql("SELECT * FROM graft_snapshot('vtab_sqltt', 99)").collect()
    }
    assert(bad.getMessage.contains("no version 99") || bad.getMessage.contains("99"),
      s"got: ${bad.getMessage}")
  }

  test("vacuum spares young orphans (the in-flight commit window), reclaims past grace") {
    val p = stage("grace")
    // a stray uncommitted data file: a crashed writer — or one mid-commit
    docs.limit(10).coalesce(1).write.mode("append").parquet(p)
    val before = dataFilesOnDisk(p)
    val (del1, drop1) = VersionedTable.vacuum(spark, p, keepLast = 2)
    assert(del1 == 0 && drop1 == 0,
      "a young orphan must survive the default grace (an in-flight commit may claim it)")
    assert(dataFilesOnDisk(p) == before)
    val (del2, _) = VersionedTable.vacuum(spark, p, keepLast = 2, orphanGraceMs = 0)
    assert(del2 == 1, "grace 0 must reclaim the orphan")
    assert(rows(VersionedTable.read(spark, p)) == rows(docs))
  }

  test("appends inherit manifest columns; refuse un-versioned paths") {
    val p = stage("cols")
    // manifest schema self-describes the stats column set across commits
    val m = spark.read.parquet(s"$p/_graft_manifest/v2")
    assert(m.columns.sorted.toSeq == Seq("file", "n_chars_max", "n_chars_min", "n_rows"))
    val fresh = s"$tmpBase/graft_vtab_none"
    LocalFs.deleteRec(fresh)
    docs.limit(3).write.mode("overwrite").parquet(fresh)
    intercept[IllegalStateException](VersionedTable.append(docs.limit(1), fresh))
    intercept[IllegalStateException](VersionedTable.read(spark, fresh))
  }
}
