package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import scala.util.control.NonFatal

/** VERSIONED manifest commits over a manifested parquet layout — the
  * minimal commit log that closes the one honesty gap the log-less
  * subsystem documented: [[ManifestScan.compact]] demands
  * single-writer-with-readers-QUIESCED because delete-then-rename is
  * visible mid-flight. Here every mutation is a new immutable
  * GENERATION and the only mutable thing is a one-word pointer:
  *
  * {{{
  *   <path>/part-<uuid>.parquet                 data files, ALL live generations
  *   <path>/_graft_manifest/v<N>/<part>.parquet manifest of version N — its
  *                                              `file` column IS the table at N
  *   <path>/_graft_current                      text "<N>", swapped by atomic rename
  * }}}
  *
  * Commit sequencing (every mutation): (1) new data files land in the
  * root — unknown to every manifest, hence INVISIBLE to versioned
  * readers; (2) the new version's manifest is fully written to a temp
  * dir and renamed to `_graft_manifest/v<N+1>` — rename-as-CAS: if the
  * version dir already exists a concurrent committer won and this one
  * fails fast, nothing corrupted; (3) the pointer flips. A crash at
  * any point leaves the table readable at its previous version — the
  * failure mode is orphaned data files (reclaimed by [[vacuum]]),
  * never duplicates, never a partial table. [[compact]] therefore
  * needs NO delete pass at all: old generations stay on disk until
  * vacuum drops them, so a reader that planned against version N keeps
  * reading version N's files mid-compaction — atomic for concurrent
  * readers, the Delta/Iceberg OPTIMIZE contract on an engine-owned
  * two-file log. Writers serialize through the rename-CAS; concurrent
  * APPENDERS retry optimistically on CAS loss ([[append]] — staged
  * files reused, only the manifest union re-runs), while a losing
  * [[compact]] fails loudly (its rewrite is stale by definition).
  *
  * Reads resolve the pointer once per plan: [[read]] (current) and
  * [[snapshotAt]] (time travel) return the SAME single-root V1 parquet
  * relation a `spark.read.parquet(path)` produces, with the FileIndex
  * restricted to the version's manifest-listed files
  * ([[graft.plans.VersionKeepFileIndex]]) — so the whole file-skipping
  * subsystem composes unchanged: the static rule
  * ([[graft.plans.ManifestFileSkipping]]) wraps the keep-index with its
  * prune-index, and the runtime join-driven rule sees the same scan
  * shape. The ONE read-path contract a versioned table changes: plain
  * `spark.read.parquet(path)` over the ROOT sees every live
  * generation at once (duplicates after a compact, until vacuum) —
  * versioned tables are read through [[read]]/[[snapshotAt]] or their
  * registered `graft.<name>` SQL identifier, exactly as a Delta
  * directory is not a plain parquet directory.
  *
  * Scale shape (100 TB): a commit is one stats pass over ONLY the new
  * files plus one metadata-scale manifest write and two renames;
  * nothing ever rewrites the log's history. The pointer is one ~8-byte
  * read per plan (cached with the manifest by the rules' signature
  * cache); vacuum is a listing diff. Same cost profile as a real lake
  * table format, without the format dependency.
  */
object VersionedTable {

  /** Pointer file name (underscore-prefixed: invisible to parquet
    * readers of the root and to [[ManifestScan.listDataFiles]]).
    */
  val PointerName = "_graft_current"

  /** The rename-as-CAS lost to a concurrent committer (or to a foreign
    * dir squatting on the target version). [[append]] catches this to
    * drive its optimistic retry; everything else fails fast. Subclasses
    * IllegalStateException so pre-retry callers' handling still works.
    */
  final class CommitConflictException private[sources] (msg: String)
    extends IllegalStateException(msg)

  private def mdir(root: Path) = new Path(root, ManifestScan.ManifestDir)
  private def vdir(root: Path, v: Long) = new Path(mdir(root), s"v$v")
  private val VersionDirRe = "v(\\d+)".r

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val root = new Path(path)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  /** Committed versions on disk, ascending (version dirs that exist,
    * pointer or not).
    */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, path)
    listVersions(fs, root)
  }

  private def listVersions(fs: FileSystem, root: Path): Seq[Long] = {
    val m = mdir(root)
    if (!fs.exists(m)) Nil
    else fs.listStatus(m).toSeq.collect {
      case s if s.isDirectory =>
        s.getPath.getName match {
          case VersionDirRe(n) => Some(n.toLong)
          case _ => None
        }
    }.flatten.sorted
  }

  /** Pointer read; None when absent/unreadable. Shared with the
    * manifest cache so plan-time resolution and the read path agree.
    */
  private[graft] def readPointer(fs: FileSystem, root: Path): Option[Long] = {
    val p = new Path(root, PointerName)
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      }
    } catch { case NonFatal(_) => None }
  }

  /** The version reads and writes resolve: the newest COMMITTED
    * generation, where the pointer is a trust-forward HINT, not the
    * truth — every generation at or below a valid pointer is known
    * committed (the flip follows the manifest rename), while a dir
    * ABOVE the pointer counts only if it actually holds manifest part
    * files ([[isCommitted]]). That one distinction covers both failure
    * shapes at once: a commit that crashed between the generation
    * rename and the pointer flip IS committed (its rename — the atomic
    * commit point — completed), so readers adopt it and the next
    * append targets the version after it instead of wedging on a
    * permanent rename-CAS conflict; a foreign or incomplete dir (a
    * pre-created empty `v<N>`, a nested lost-rename artifact) is NOT a
    * commit and never becomes current. Steady state (pointer == max)
    * pays zero completeness probes. A missing pointer falls back to
    * the newest committed generation — which also covers the only
    * pointer-swap window a non-atomic-rename filesystem has.
    */
  def currentVersion(spark: SparkSession, path: String): Option[Long] = {
    val (fs, root) = fsOf(spark, path)
    currentVersion(fs, root)
  }

  private[graft] def currentVersion(fs: FileSystem, root: Path): Option[Long] =
    resolveVersion(fs, root, listVersions(fs, root))

  /** [[currentVersion]] over an already-listed version set — shared
    * with the manifest cache ([[graft.plans.ManifestFileSkipping]]),
    * which has the listing in hand, so plan-time resolution and the
    * read/write paths agree on what "current" means.
    */
  private[graft] def resolveVersion(fs: FileSystem, root: Path,
      vs: Seq[Long]): Option[Long] = {
    if (vs.isEmpty) return None
    val floor = readPointer(fs, root).filter(vs.contains).getOrElse(Long.MinValue)
    vs.sorted.reverse.find(v => v <= floor || isCommitted(fs, root, v))
      // degenerate corner (no pointer AND no complete generation —
      // debris-only): resolve to max as before, so the failure mode
      // stays a loud read error, not a phantom "not versioned"
      .orElse(Some(vs.max))
  }

  /** Is `v`'s generation dir an actual commit? The manifest is written
    * whole to a `_tmp_` dir and atomically renamed in, so a REAL
    * generation holds its parquet part files from the instant it
    * exists; an empty or foreign dir holds none and never will.
    */
  private def isCommitted(fs: FileSystem, root: Path, v: Long): Boolean =
    try fs.listStatus(vdir(root, v)).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    catch { case NonFatal(_) => false }

  /** Is this layout under versioned-commit management? */
  def isVersioned(spark: SparkSession, path: String): Boolean = {
    val (fs, root) = fsOf(spark, path)
    listVersions(fs, root).nonEmpty
  }

  /** Stats/bloom column sets a manifest schema self-describes —
    * `<c>_min`/`<c>_max` pairs and `<c>_bloom_k` markers. How append,
    * compact, and the SQL INSERT path know what to maintain without
    * out-of-band configuration.
    */
  private[graft] def manifestColumns(
      schema: org.apache.spark.sql.types.StructType): (Seq[String], Seq[String]) = {
    val names = schema.fieldNames.toSeq
    (names.filter(_.endsWith("_min")).map(_.dropRight(4)).sorted,
      names.filter(_.endsWith("_bloom_k")).map(_.dropRight(8)).sorted)
  }

  /** Put an existing plain layout (or a freshly written one) under
    * versioned management: version 1 covers exactly the data files on
    * disk now. A legacy un-versioned flat manifest
    * (from [[ManifestScan.buildManifest]]) is superseded and removed
    * after the commit. Refuses an already-versioned path and an empty
    * directory (nothing to version — write data first or use
    * [[ManifestScan.writeAppend]] then init).
    *
    * @return the committed version (always 1).
    */
  def init(spark: SparkSession, path: String, statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, bloomBits: Int = 0, bloomK: Int = 3): Long = {
    val (fs, root) = fsOf(spark, path)
    require(listVersions(fs, root).isEmpty,
      s"VersionedTable.init: $path is already versioned (versions ${listVersions(fs, root)})")
    val files = ManifestScan.listDataFiles(fs, root)
    require(files.nonEmpty, s"VersionedTable.init: no data files under $path")
    val frame = ManifestScan.manifestFrame(
      spark.read.parquet(path), statsCols, bloomCols, bloomBits, bloomK).persist()
    try commit(spark, fs, root, 1L,
      ManifestScan.completeFrame(spark, frame, files))
    finally frame.unpersist()
    // retire the legacy flat manifest: the versioned resolver would
    // ignore it anyway, but a stale file pretending to be a manifest
    // invites confusion
    val m = mdir(root)
    fs.listStatus(m).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach(s => fs.delete(s.getPath, false))
    1L
  }

  /** Append `df` as version N+1: the batch is written to a staging dir
    * and MOVED into the root — so this writer's file set is known
    * exactly, never inferred by diffing the shared directory (a
    * racing writer's freshly landed files must not be absorbed into
    * this generation). The new files' manifest rows are computed in
    * one stats pass and UNIONED with version N's rows (an append keeps
    * every old file), and the pointer flips. Stats/bloom columns are
    * inherited from the current manifest schema. `layout` shapes the
    * write (e.g. `_.repartitionByRange(n, col)`) exactly as in
    * [[ManifestScan.writeAppend]].
    *
    * CONCURRENT appenders commit with OPTIMISTIC RETRY (the Delta
    * commit discipline): losing the rename-CAS means some other
    * committer's generation landed, and since this batch's data files
    * are already in the root and referenced by no generation, the
    * commit — not the data write, not the stats pass — simply re-runs
    * against the NEW current version (re-read its manifest, re-union
    * this batch's rows, re-CAS), up to `maxAttempts` times. Retry
    * happens ONLY when the resolved version actually ADVANCED between
    * attempts: a conflict with no progress (a foreign/incomplete dir
    * squatting on the target version) can never succeed and fails on
    * the first attempt, exactly as before. On final failure the staged
    * files are orphans — invisible to every reader, reclaimed by
    * [[vacuum]] — and the thrown error says so.
    *
    * @return the committed version.
    */
  def append(df: DataFrame, path: String,
      layout: DataFrame => DataFrame = identity, maxAttempts: Int = 5): Long = {
    require(maxAttempts >= 1, s"VersionedTable.append: maxAttempts=$maxAttempts must be >= 1")
    val spark = df.sparkSession
    val (fs, root) = fsOf(spark, path)
    val v0 = currentVersion(fs, root).getOrElse(
      throw new IllegalStateException(s"VersionedTable.append: $path is not versioned - init first"))
    val (statsCols, bloomCols) = manifestColumns(
      spark.read.parquet(vdir(root, v0).toString).schema)
    val staging = new Path(root,
      s"_graft_append_${java.util.UUID.randomUUID().toString.take(8)}")
    layout(df).write.mode("overwrite").parquet(staging.toString)
    val fresh = ManifestScan.listDataFiles(fs, staging).map { p =>
      val dst = new Path(root, p.getName)
      if (!fs.rename(p, dst))
        throw new IllegalStateException(s"VersionedTable.append: rename $p -> $dst failed")
      dst
    }
    fs.delete(staging, true)
    // ONE stats pass for the whole retry loop: the batch's manifest
    // rows are version-independent (they describe only this batch's
    // files) — persisted so each attempt's union + write re-reads
    // cached metadata-scale rows, never the data
    val stats =
      if (fresh.isEmpty) None
      else Some(ManifestScan.manifestFrame(
        spark.read.parquet(fresh.map(_.toString): _*), statsCols, bloomCols, 0, 3)
        .persist())
    val freshRows = stats.map(s => ManifestScan.completeFrame(spark, s, fresh))
    try {
      var v = v0
      var attempt = 1
      while (true) {
        val vd = vdir(root, v)
        def giveUp(why: Throwable): Nothing =
          throw new IllegalStateException(
            s"VersionedTable.append: commit at $root failed after $attempt attempt(s) " +
              s"(${why.getMessage}); this batch's ${fresh.size} staged data files are " +
              "invisible to every reader and will be reclaimed by vacuum", why)
        def advanceOr(why: Throwable): Unit = {
          val now = currentVersion(fs, root).getOrElse(v)
          if (now <= v || attempt >= maxAttempts) giveUp(why)
          v = now
          attempt += 1
        }
        try {
          val prev = spark.read.parquet(vd.toString)
          val rows = freshRows.fold(prev)(prev.unionByName(_))
          return commit(spark, fs, root, v + 1, rows)
        } catch {
          case c: CommitConflictException => advanceOr(c)
          case NonFatal(e) if !fs.exists(vd) =>
            // the base generation was VACUUMED out from under this
            // attempt (retention raced the commit): vacuum always
            // keeps the current version, so current is strictly newer
            // than v — same progress guarantee as a CAS loss, same
            // retry (nothing about the staged batch changes)
            advanceOr(e)
        }
      }
      throw new IllegalStateException("unreachable")
    } finally stats.foreach(_.unpersist())
  }

  /** Compaction as a COMMIT, not a rewrite: the current snapshot is
    * read (through its manifest — never the raw directory), rewritten
    * into ~`numFiles` files (0 = auto-size at ~128 MB from the
    * snapshot's bytes), optionally range-clustered on `orderBy`, and
    * committed as version N+1 whose manifest lists ONLY the new
    * generation. The old generation's files are NOT touched — a
    * concurrent reader planned at version N keeps its complete file
    * set until [[vacuum]] reclaims it. No-op below the target count.
    *
    * @return (files in version N, files in the committed version).
    */
  def compact(spark: SparkSession, path: String, numFiles: Int = 0,
      orderBy: Option[String] = None): (Int, Int) = {
    val (fs, root) = fsOf(spark, path)
    val v = currentVersion(fs, root).getOrElse(
      throw new IllegalStateException(s"VersionedTable.compact: $path is not versioned - init first"))
    val prev = spark.read.parquet(vdir(root, v).toString)
    val (statsCols, bloomCols) = manifestColumns(prev.schema)
    val keep = fileNames(prev)
    val kept = ManifestScan.listDataStatuses(fs, root)
      .filter(s => keep.contains(s.getPath.getName))
    val totalBytes = kept.map(_.getLen).sum
    val target = math.max(1,
      if (numFiles > 0) numFiles
      else math.ceil(totalBytes / (128.0 * 1024 * 1024)).toInt)
    if (kept.length <= target) return (kept.length, kept.length)
    val staging = new Path(root,
      s"_graft_compact_v${v + 1}_${java.util.UUID.randomUUID().toString.take(8)}")
    val data = snapshotAt(spark, path, v)
    val shaped = orderBy match {
      case Some(c) =>
        data.repartitionByRange(target, col(c)).sortWithinPartitions(col(c))
      case None => data.repartition(target)
    }
    shaped.write.mode("overwrite").parquet(staging.toString)
    // move the new generation into the root BEFORE the stats pass, so
    // the manifest's `file` column carries the final paths; until the
    // commit below these files belong to no version and every
    // versioned reader ignores them
    val moved = ManifestScan.listDataFiles(fs, staging).map { p =>
      val dst = new Path(root, p.getName)
      if (!fs.rename(p, dst))
        throw new IllegalStateException(s"VersionedTable.compact: rename $p -> $dst failed")
      dst
    }
    fs.delete(staging, true)
    val stats = ManifestScan.manifestFrame(
      spark.read.parquet(moved.map(_.toString): _*), statsCols, bloomCols, 0, 3).persist()
    // no optimistic retry here, unlike append: a compact that lost the
    // CAS rewrote a snapshot that is no longer current — its generation
    // would DROP the winner's rows. The rewrite must rerun; say so.
    try commit(spark, fs, root, v + 1,
      ManifestScan.completeFrame(spark, stats, moved))
    catch {
      case c: CommitConflictException =>
        throw new IllegalStateException(
          s"VersionedTable.compact: lost the commit race at $root (${c.getMessage}); " +
            "the compacted generation is stale against the new current version - its " +
            s"${moved.size} files are invisible orphans until vacuum; re-run compact", c)
    }
    finally stats.unpersist()
    (kept.length, moved.length)
  }

  /** The table at its current version — resolved once, at plan time:
    * the returned DataFrame's file set is pinned, so a commit (even a
    * compact) that lands AFTER this call changes nothing about it.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (fs, root) = fsOf(spark, path)
    val v = currentVersion(fs, root).getOrElse(
      throw new IllegalStateException(s"VersionedTable.read: $path is not versioned"))
    snapshotAt(spark, path, v)
  }

  /** Time travel: the table exactly as committed at `version`. Valid
    * until a vacuum drops the generation.
    */
  def snapshotAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    val (fs, root) = fsOf(spark, path)
    val vd = vdir(root, version)
    require(fs.exists(vd),
      s"VersionedTable.snapshotAt: no version $version at $path " +
        s"(have ${listVersions(fs, root).mkString(",")})")
    val keep = fileNames(spark.read.parquet(vd.toString))
    keepRead(spark, path, keep)
  }

  /** Reclaim space: keep the newest `keepLast` generations (and always
    * the current one), delete every data file referenced by NO kept
    * generation and every dropped generation's manifest. Safe order:
    * manifests of dropped versions go first, so a crash mid-vacuum can
    * orphan data files (re-vacuum reclaims them) but never leave a
    * resolvable version with missing files... except versions already
    * being dropped, whose readers the caller has aged out — that grace
    * period is the caller's retention policy, exactly as in
    * Delta's VACUUM.
    *
    * Files referenced by NO version at all (orphans) are deleted only
    * past `orphanGraceMs` (mtime-based, default 10 min): vacuum runs
    * outside the commit CAS, and an in-flight append/compact has
    * already LANDED its data files before its commit references them
    * — deleting a young orphan could gut the commit that is about to
    * win. Files referenced only by DROPPED generations carry no such
    * window (their manifests are being deleted here, by retention
    * policy) and go immediately. Same two-phase discipline as Delta's
    * VACUUM retention check.
    *
    * @return (data files deleted, versions dropped).
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int = 2,
      orphanGraceMs: Long = 600000L): (Int, Int) = {
    require(keepLast >= 1, s"VersionedTable.vacuum: keepLast=$keepLast must be >= 1")
    val (fs, root) = fsOf(spark, path)
    val vs = listVersions(fs, root)
    if (vs.isEmpty) return (0, 0)
    val cur = currentVersion(fs, root).get
    val keepVs = (vs.takeRight(keepLast) :+ cur).distinct.sorted
    val dropVs = vs.filterNot(keepVs.contains)
    val referenced = keepVs.iterator.flatMap { v =>
      fileNames(spark.read.parquet(vdir(root, v).toString))
    }.toSet
    val droppedRefs = dropVs.iterator.flatMap { v =>
      fileNames(spark.read.parquet(vdir(root, v).toString))
    }.toSet
    // manifests first (see scaladoc), then unreferenced data files
    dropVs.foreach(v => fs.delete(vdir(root, v), true))
    val cutoff = System.currentTimeMillis() - math.max(0L, orphanGraceMs)
    val doomed = ManifestScan.listDataStatuses(fs, root)
      .filterNot(s => referenced.contains(s.getPath.getName))
      .filter(s => droppedRefs.contains(s.getPath.getName) ||
        s.getModificationTime <= cutoff)
    doomed.foreach(s => fs.delete(s.getPath, false))
    (doomed.length, dropVs.length)
  }

  /** Part-file NAMES of a manifest frame's `file` column (manifests
    * store full `input_file_name()` URIs; names are unique within the
    * root and immune to scheme/authority spelling).
    */
  private def fileNames(manifest: DataFrame): Set[String] =
    manifest.select(col("file")).collect()
      .map(r => new Path(r.getString(0)).getName).toSet

  /** Single-root V1 relation restricted to `keep` — the shape both
    * file-skipping rules compose with (see
    * [[graft.plans.VersionKeepFileIndex]]).
    */
  private def keepRead(spark: SparkSession, path: String, keep: Set[String]): DataFrame = {
    val plan = spark.read.parquet(path).queryExecution.analyzed.transform {
      case l: LogicalRelation =>
        l.relation match {
          case hfs: HadoopFsRelation =>
            l.copy(relation = hfs.copy(
              location = new graft.plans.VersionKeepFileIndex(hfs.location, keep))(spark))
          case _ => l
        }
    }
    Bridge.ofRows(spark, plan)
  }

  /** The commit point: write the manifest frame to a temp dir inside
    * `_graft_manifest`, rename-as-CAS onto `v<N>` (an existing version
    * dir means a concurrent committer won — fail fast, delete the temp,
    * corrupt nothing), then flip the pointer. Rename-first pointer swap
    * is atomic where the FS supports replace; the delete+rename
    * fallback's brief pointer-less window resolves to the same version
    * via [[currentVersion]]'s max-generation fallback.
    *
    * @return the committed version.
    */
  private def commit(spark: SparkSession, fs: FileSystem, root: Path,
      version: Long, manifest: DataFrame): Long = {
    val target = vdir(root, version)
    if (fs.exists(target))
      throw new CommitConflictException(
        s"VersionedTable: version $version already exists at $root - concurrent commit lost")
    val tmp = new Path(mdir(root),
      s"_tmp_v${version}_${java.util.UUID.randomUUID().toString.take(8)}")
    try manifest.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    catch {
      // a failed manifest-write JOB (e.g. the source generation's part
      // files vacuumed mid-read) must not leave a partial _tmp_ dir:
      // inert either way, but the append retry path would accrete one
      // per attempt
      case NonFatal(e) => fs.delete(tmp, true); throw e
    }
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, true)
      throw new CommitConflictException(
        s"VersionedTable: commit of version $version at $root lost the rename race " +
          "(concurrent committer) - this writer's generation was discarded, table intact")
    }
    // exists-then-rename is check-then-act: several FileSystems
    // (HDFS, ChecksumFileSystem) implement rename onto an EXISTING
    // directory as move-INTO — a racing committer that lost the window
    // would "succeed" by nesting its tmp dir inside the winner's
    // generation and silently lose its rows. Detect the nesting: the
    // winner's readers are unaffected (the manifest loader lists only
    // top-level parquet FILES), the loser cleans up and fails fast, as
    // promised.
    val nested = new Path(target, tmp.getName)
    if (fs.exists(nested)) {
      fs.delete(nested, true)
      throw new CommitConflictException(
        s"VersionedTable: commit of version $version at $root lost the rename race " +
          "(rename nested into the winner's generation) - this writer's generation " +
          "was discarded, table intact")
    }
    writePointer(fs, root, version)
    version
  }

  private def writePointer(fs: FileSystem, root: Path, version: Long): Unit = {
    val cur = new Path(root, PointerName)
    val tmp = new Path(root,
      s"$PointerName.tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(version.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, cur)) {
      fs.delete(cur, false)
      if (!fs.rename(tmp, cur))
        throw new IllegalStateException(s"VersionedTable: pointer swap failed at $root")
    }
  }
}
