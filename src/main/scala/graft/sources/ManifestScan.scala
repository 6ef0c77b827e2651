package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-skipping scan over a parquet directory via a per-file min/max
  * manifest — the READ path that makes the X168 audit
  * ([[graft.operators.ManifestPrune]], the payoff METER) an actual
  * I/O saving: the audit measures how many files a range predicate
  * could skip; this scan consults a stored manifest and never opens
  * them.
  *
  * Layout: the manifest lives at `<path>/_graft_manifest` — a leading
  * underscore keeps Spark's parquet FileIndex from picking it up as
  * data (the `_SUCCESS`/`_delta_log` convention), so `<path>` stays a
  * perfectly ordinary parquet directory for full scans.
  *
  * Contract: the manifest stores per (file, column) `[min, max]` over
  * LONG-valued stats columns. [[prunedFiles]] keeps a file iff its
  * range OVERLAPS the query range — skipping is conservative (a kept
  * file may still hold zero hits; a skipped file provably holds none),
  * so [[readRange]] re-applies the predicate and is exactly
  * full-scan-filter equivalent, pinned hash-green by
  * `q_source_manifest_scan` against a DuckDB full-scan oracle.
  *
  * Scale shape (100 TB): the manifest is metadata-scale (one row per
  * file — millions of rows for a petabyte lake, a single-executor
  * job); building it is ONE map-side-combined aggregate over the data
  * keyed by `input_file_name()`, done once per layout write and
  * appendable incrementally (new files → new manifest rows, the
  * [[graft.operators.IncrementalDedup]] pattern). The pruning decision
  * itself never touches data files; the selected list feeds a direct
  * multi-path parquet scan, so a selective predicate over a
  * range-clustered layout does O(overlapping files) I/O instead of
  * O(all files) — the same file-skipping contract Delta/Iceberg derive
  * from their logs, here as an explicit, engine-owned manifest. In a
  * real lake the min/max would come free from parquet footers; the
  * explicit manifest keeps the decision one metadata read instead of
  * N footer reads.
  */
object ManifestScan {

  /** Manifest subdirectory name (underscore-prefixed: invisible to the
    * parquet reader of `<path>` itself).
    */
  val ManifestDir = "_graft_manifest"

  private def manifestPath(path: String) = s"$path/$ManifestDir"

  /** Refuse the flat-manifest WRITE/maintenance ops on a root under
    * versioned management: they read the raw directory — EVERY live
    * generation at once, i.e. duplicated rows after any compact — and
    * compact's delete pass would remove files committed version
    * manifests still reference, which the versioned read path would
    * silently drop ([[graft.plans.VersionKeepFileIndex]] keeps only
    * what exists). One listStatus of the manifest dir per call.
    */
  private def requireFlat(spark: SparkSession, path: String, op: String): Unit =
    require(!VersionedTable.isVersioned(spark, path),
      s"ManifestScan.$op: $path is under versioned management (_graft_manifest/v<N> " +
        "generations) - use VersionedTable.append/compact/vacuum instead; flat-manifest " +
        "ops would read every live generation at once and corrupt committed versions")

  /** Post-write cache upkeep shared by [[buildManifest]] and the
    * refresh path: a pre-build probe may have negative-cached "no
    * manifest here" for up to a minute — drop that entry (both path
    * spellings) so the very next consumer sees the manifest.
    */
  private def uncacheMiss(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit =
    graft.plans.ManifestFileSkipping.invalidateNegative(root, fs.makeQualified(root))

  /** Build (or rebuild) the manifest for `path`: one row per data file
    * with `n_rows` and `<col>_min`/`<col>_max` for each stats column
    * (long-valued). One aggregate pass over the data, metadata-scale
    * output.
    */
  def buildManifest(spark: SparkSession, path: String, statsCols: Seq[String]): Unit =
    buildManifest(spark, path, statsCols, Nil)

  /** Build (or rebuild) the manifest with optional PER-FILE BLOOM
    * FILTERS over `bloomCols` — the point-lookup complement to the
    * min/max bands: on a layout clustered by some OTHER column, every
    * file's [min, max] on a high-cardinality key spans the whole
    * domain (band skipping is useless), but a per-file bloom pins the
    * handful of files that can actually hold a probed key — needle
    * lookups without re-clustering, the same role as parquet's
    * column-index bloom filters, engine-owned and externally
    * replayable (the [[graft.operators.CountMinSketch.cellHash]] md5
    * family, packed 32 bits per long word like
    * [[graft.operators.BloomFilter]]).
    *
    * Stored sparse per (file, column): `<c>_bloom_widx`/`<c>_bloom_word`
    * parallel long arrays sorted by word index, plus `<c>_bloom_k`/
    * `<c>_bloom_m` so readers need no out-of-band parameters. A file
    * whose column is all-null gets EMPTY arrays — membership is
    * definitively false there, which is exact for point equality.
    * Size: ≤ m/32 words per file per column. `bloomBits = 0` (the
    * default) AUTO-SIZES m to ~10 bits per expected key per file
    * (one cheap (rows, files) pre-pass; clamped [512, 2^21]) — an
    * undersized bloom SATURATES and silently stops skipping, the
    * trap the SCALE.md skip probe measures; pass an explicit m only
    * when the per-file key count is known better than rows/files.
    */
  def buildManifest(spark: SparkSession, path: String, statsCols: Seq[String],
      bloomCols: Seq[String], bloomBits: Int = 0, bloomK: Int = 3): Unit = {
    requireFlat(spark, path, "buildManifest")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // persist around the two actions: completeFrame's collect of the
    // produced file set and the write would otherwise each run the
    // full stats/bloom aggregation over the data — the heaviest pass
    // of the build, doubled on a large layout
    val frame = manifestFrame(
      spark.read.parquet(path), statsCols, bloomCols, bloomBits, bloomK).persist()
    try
      completeFrame(spark, frame, listDataFiles(fs, root))
        .coalesce(1) // metadata-scale: one row per data file
        .write.mode("overwrite").parquet(manifestPath(path))
    finally frame.unpersist()
    uncacheMiss(fs, root)
  }

  /** Recursive data-file listing (skipping `_`/`.`-prefixed names at
    * every level): buildManifest covers files through
    * `spark.read.parquet(path)`, which descends into partition
    * subdirectories — the refresh walk must see the same set or
    * nested appends would silently never be covered.
    */
  private[graft] def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
    listDataStatuses(fs, dir).map(_.getPath)

  /** Status-returning form of [[listDataFiles]]: callers needing sizes
    * or mtimes (compaction targets, cache signatures) take them from
    * the listing itself — one listStatus per directory instead of one
    * getFileStatus RPC per FILE, which on an object store turns a
    * 10k-file signature into 10k HEAD requests.
    */
  private[graft] def listDataStatuses(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val (dirs, files) = fs.listStatus(dir).partition(_.isDirectory)
    val here = files.iterator
      .filter(s => s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val below = dirs.iterator.map(_.getPath)
      .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
      .flatMap(listDataStatuses(fs, _))
    (here ++ below).toSeq
  }

  /** Add explicit rows for ZERO-ROW data files: `manifestFrame` groups
    * by `input_file_name()` and so never emits a row for a file with
    * no rows — which would leave it outside the covered set forever
    * (every refresh re-listing it as fresh, breaking run-twice ≡
    * run-once) and merely "unknown" to the rule. A synthesized row
    * (n_rows = 0, all-null stats, empty blooms) is EXACT: an empty
    * file provably matches no predicate, so the rule skips it.
    */
  private[sources] def completeFrame(spark: SparkSession, frame: DataFrame,
      all: Seq[org.apache.hadoop.fs.Path]): DataFrame = {
    val produced = frame.select(col("file")).collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    val missing = all.filterNot(p => produced.contains(p.getName))
    if (missing.isEmpty) frame
    else {
      val schema = frame.schema
      val rows: java.util.List[org.apache.spark.sql.Row] = new java.util.ArrayList()
      missing.foreach { p =>
        val vals: Array[Any] = schema.fields.map { f =>
          f.name match {
            case "file" => p.toString
            case "n_rows" => 0L
            case n if n.endsWith("_bloom_widx") || n.endsWith("_bloom_word") =>
              Seq.empty[Long]
            case n if n.endsWith("_bloom_k") => 3
            case n if n.endsWith("_bloom_m") => 512
            case _ => null // *_min / *_max: all-null stats
          }
        }
        rows.add(org.apache.spark.sql.Row(vals: _*))
      }
      frame.unionByName(spark.createDataFrame(rows, schema))
    }
  }

  /** Incrementally extend the manifest to data files appended AFTER
    * the last build/refresh — the streaming-ingestion shape: appends
    * land, the manifest gains their rows, skipping stays effective
    * without rescanning covered files. (Without a refresh the
    * automatic rule still returns correct results — unknown files are
    * always kept — it just stops skipping the new ones.) One stats
    * pass over ONLY the new files, appended as new manifest part
    * files; per-row self-describing bloom k/m means refresh params
    * could even differ per generation. Idempotent: a second call finds
    * nothing new and appends nothing — same run-twice ≡ run-once
    * contract as the X205b fingerprint-index refresh.
    *
    * @return number of newly covered data files.
    */
  def refreshManifest(spark: SparkSession, path: String, statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, bloomBits: Int = 0, bloomK: Int = 3): Int = {
    requireFlat(spark, path, "refreshManifest")
    refreshInternal(spark, path, statsCols, bloomCols, bloomBits, bloomK, None)._1.size
  }

  /** [[refreshManifest]] with an optional caller-carried covered set —
    * the amortization hook for [[manifestedSink]], whose per-batch
    * refresh must not re-collect the manifest's full file column (O(table
    * files) driver work per micro-batch, quadratic over a stream's
    * lifetime). A hint is trusted only while the manifest still exists;
    * if it vanished mid-stream the covered set rebuilds from scratch.
    *
    * @return (newly covered file names, full covered set after).
    */
  private def refreshInternal(spark: SparkSession, path: String, statsCols: Seq[String],
      bloomCols: Seq[String], bloomBits: Int, bloomK: Int,
      coveredHint: Option[Set[String]]): (Set[String], Set[String]) = {
    // no requireFlat here: every public entry (refreshManifest,
    // writeAppend, manifestedSink's per-batch closure) guards exactly
    // once before reaching this - a second probe per call would double
    // the metadata RPCs on the streaming hot path
    val hconf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(hconf)
    val dataFiles = listDataFiles(fs, root)
    val mdir = new org.apache.hadoop.fs.Path(root, ManifestDir)
    // ONE manifest read serves both the schema check and the covered
    // set; the check runs BEFORE any job over the new data, so a
    // mixed-column-set call is rejected without wasted work
    val existing: Option[DataFrame] =
      if (fs.exists(mdir)) Some(spark.read.parquet(manifestPath(path))) else None
    existing.foreach { mdf =>
      // appending into an existing manifest: the column sets must
      // agree or readers would see a mixed schema (k/m VALUES may
      // differ — rows are self-describing — but the shape may not)
      val expected = (Seq("file", "n_rows") ++
        statsCols.flatMap(c => Seq(s"${c}_min", s"${c}_max")) ++
        bloomCols.flatMap(c => Seq(s"${c}_bloom_widx", s"${c}_bloom_word",
          s"${c}_bloom_k", s"${c}_bloom_m"))).sorted
      val got = mdf.schema.fieldNames.sorted.toSeq
      require(got == expected,
        s"refreshManifest: stats/bloom columns must match the existing manifest " +
          s"(existing $got, incoming $expected) — rebuild with buildManifest to change them")
    }
    val covered: Set[String] =
      if (existing.isEmpty) Set.empty
      else coveredHint.getOrElse(existing.get.select(col("file")).collect()
        .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet)
    val fresh = dataFiles.filterNot(p => covered.contains(p.getName))
    if (fresh.isEmpty) return (Set.empty, covered)
    // persist for the same reason as buildManifest: completeFrame's
    // collect and the append are two actions over the one stats pass
    val stats = manifestFrame(
      spark.read.parquet(fresh.map(_.toString): _*), statsCols, bloomCols, bloomBits, bloomK)
      .persist()
    try completeFrame(spark, stats, fresh)
      .coalesce(1).write.mode("append").parquet(manifestPath(path))
    finally stats.unpersist()
    uncacheMiss(fs, root)
    val freshNames = fresh.map(_.getName).toSet
    (freshNames, covered ++ freshNames)
  }

  /** WRITE-side manifest maintenance: append `df` into `path` AND
    * extend the manifest to the new files in ONE call — the ingestion
    * closure that keeps file skipping effective on a live table
    * without every writer remembering to refresh. Crash-safe in the
    * skipping contract's own terms: if the process dies between the
    * append and the refresh, the new files are merely UNKNOWN to the
    * manifest (always kept, never lost) and the next writeAppend's
    * refresh covers them. First write to an empty directory works too
    * (refresh with no existing manifest covers everything).
    *
    * `layout` shapes each write before it lands (e.g.
    * `_.repartitionByRange(n, col)` to keep the clustering that makes
    * band skipping effective) — applied here so the stats pass and
    * the data files see the same shape.
    *
    * @return number of data files the refresh newly covered.
    */
  def writeAppend(df: DataFrame, path: String, statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, bloomBits: Int = 0, bloomK: Int = 3,
      layout: DataFrame => DataFrame = identity): Int = {
    // guard BEFORE the data write: landing flat-append files into a
    // versioned root would leave them invisible to every version
    requireFlat(df.sparkSession, path, "writeAppend")
    layout(df).write.mode("append").parquet(path)
    refreshInternal(df.sparkSession, path, statsCols, bloomCols, bloomBits, bloomK, None)
      ._1.size
  }

  /** Streaming ingestion sink: a `foreachBatch` function that appends
    * each micro-batch through [[writeAppend]], so the manifest is
    * refreshed batch-by-batch and a declarative read prunes files the
    * moment the trigger completes — e.g.
    * {{{
    *   stream.writeStream
    *     .foreachBatch(ManifestScan.manifestedSink(path, Seq("ts")))
    *     .option("checkpointLocation", ckpt)
    *     .trigger(Trigger.AvailableNow()).start()
    * }}}
    * Run-twice idempotence comes from the checkpoint (a finished
    * AvailableNow re-run replays no batches, so nothing is appended
    * and the refresh finds nothing new); a batch REPLAYED after a
    * mid-batch crash re-appends its files — the file source's
    * standard at-least-once foreachBatch contract — and the refresh
    * covers them exactly once each, keeping skipping correct either
    * way (kept files are re-filtered by every read path).
    */
  def manifestedSink(path: String, statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, bloomBits: Int = 0, bloomK: Int = 3,
      layout: DataFrame => DataFrame = identity): (DataFrame, Long) => Unit = {
    // covered-set carried ACROSS batches: the manifest's file column is
    // collected once (first batch, or after a restart/manifest loss) and
    // extended locally, so a long-lived stream pays O(new files) manifest
    // work per batch instead of O(table files) — the directory listing
    // that finds the new files stays, but it is pure FS metadata.
    // Single-writer assumption (the streaming sink owns its table): a
    // concurrent writer's refresh is invisible to the hint and its files
    // would be covered twice.
    var covered: Option[Set[String]] = None
    (batch, _) => {
      requireFlat(batch.sparkSession, path, "manifestedSink")
      layout(batch).write.mode("append").parquet(path)
      val (_, after) = refreshInternal(
        batch.sparkSession, path, statsCols, bloomCols, bloomBits, bloomK, covered)
      covered = Some(after)
    }
  }

  /** COMPACTION — the maintenance op that closes the live-table loop:
    * streaming ingestion ([[manifestedSink]]) lands one small file per
    * micro-batch, and a thousand 1 MB files cost a thousand opens,
    * footer reads, and manifest rows for data one file could hold.
    * Rewrite the layout into ~`numFiles` files (0 = auto-size at ~128
    * MB per file from the current total), optionally RANGE-CLUSTERED
    * on `orderBy` so band skipping gets sharper, then rebuild the
    * manifest — same read semantics, strictly fewer opens.
    *
    * Sequencing (no commit log, so single-writer with readers
    * quiesced — the same contract as a log-less Hive/parquet table
    * rewrite; [[VersionedTable.compact]] is the commit-logged form
    * that lifts it): (1) the compacted generation is fully WRITTEN to
    * `<path>/_graft_compact` (underscore-hidden from readers) and only
    * then (2) old data files are deleted, (3) new files renamed in,
    * (4) the manifest rebuilt. A crash never yields silent duplicates
    * — the failure mode is a visibly missing/partial table with the
    * full compacted generation intact under `_graft_compact` for
    * recovery, which beats transiently-doubled rows that read as
    * correct. No-op (returns unchanged counts) when the layout already
    * has ≤ max(numFiles, 1) files.
    *
    * Scale shape (100 TB): one shuffle-write pass over the table (the
    * range cluster), metadata-only renames, and a manifest rebuild
    * that is itself one aggregate pass — the cost profile of any
    * OPTIMIZE. Z-ordered layouts compose for free: pass the stored z
    * column as `orderBy`.
    *
    * @return (data files before, data files after).
    */
  def compact(spark: SparkSession, path: String, statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, numFiles: Int = 0, orderBy: Option[String] = None,
      bloomBits: Int = 0, bloomK: Int = 3): (Int, Int) = {
    requireFlat(spark, path, "compact")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val beforeStatuses = listDataStatuses(fs, root)
    val before = beforeStatuses.map(_.getPath)
    val totalBytes = beforeStatuses.map(_.getLen).sum
    val target = math.max(1,
      if (numFiles > 0) numFiles
      else math.ceil(totalBytes / (128.0 * 1024 * 1024)).toInt)
    if (before.length <= target) return (before.length, before.length)
    val tmpDir = new org.apache.hadoop.fs.Path(root, "_graft_compact")
    fs.delete(tmpDir, true) // leftovers of an aborted earlier attempt
    val data = spark.read.parquet(path)
    val shaped = orderBy match {
      case Some(c) =>
        data.repartitionByRange(target, col(c)).sortWithinPartitions(col(c))
      case None => data.repartition(target)
    }
    shaped.write.mode("overwrite").parquet(tmpDir.toString)
    val fresh = listDataFiles(fs, tmpDir)
    // ENFORCE the single-writer contract instead of trusting the doc
    // comment: a file appended (e.g. by manifestedSink) between the
    // source listing above and the delete pass below would have its
    // rows absorbed into the compacted generation AND survive the
    // delete (it was not in `before`) — silent duplication. Re-list
    // immediately before the destructive pass and abort, leaving the
    // compacted generation intact under `_graft_compact` and the live
    // table untouched. [[graft.sources.VersionedTable.compact]] is the
    // concurrent-safe form (commit-log sequencing, no delete at all).
    val relisted = listDataFiles(fs, root).map(_.getName).toSet
    if (relisted != before.map(_.getName).toSet) {
      throw new IllegalStateException(
        s"compact: concurrent write detected at $path (data file set changed during " +
          s"the rewrite) - table left untouched, compacted generation preserved at " +
          s"$tmpDir; quiesce writers and retry, or use VersionedTable.compact")
    }
    // new generation fully on disk: retire the old one, rename in the
    // new (fresh writes carry unique UUID part names — no collisions)
    before.foreach(p => fs.delete(p, false))
    fresh.foreach(p => fs.rename(p, new org.apache.hadoop.fs.Path(root, p.getName)))
    fs.delete(tmpDir, true)
    buildManifest(spark, path, statsCols, bloomCols, bloomBits, bloomK)
    (before.length, fresh.length)
  }

  /** The manifest frame for `data`: one row per file with n_rows,
    * per-column long min/max, and optional sparse per-file blooms.
    */
  private[sources] def manifestFrame(data: DataFrame, statsCols: Seq[String],
      bloomCols: Seq[String], bloomBitsIn: Int, bloomK: Int): DataFrame = {
    require(statsCols.nonEmpty || bloomCols.nonEmpty,
      "buildManifest: need at least one stats or bloom column")
    require(bloomK >= 1 && bloomK <= 12 &&
      (bloomBitsIn == 0 || (bloomBitsIn >= 32 && bloomBitsIn % 32 == 0)),
      s"buildManifest: bloomK=$bloomK bloomBits=$bloomBitsIn (0 = auto)")
    // AUTO-SIZING (bloomBits = 0): a bloom sized below its key count
    // SATURATES — every bit set, every file kept, skipping silently
    // gone (there is no error signal; a saturated bloom is merely
    // useless). Target ~10 bits per key in the LARGEST file (fpp ≈ 3%
    // at k=3) — the average would leave the biggest file of a skewed
    // layout (exactly the one worth skipping) saturated. One cheap
    // per-file-count pre-pass; per-row self-describing k/m means
    // mixed generations stay probeable.
    val bloomBits =
      if (bloomBitsIn != 0 || bloomCols.isEmpty) bloomBitsIn
      else {
        // input_file_name is non-deterministic: project it first (ANSI
        // analyzer rejects it directly inside an aggregate function)
        val r = data.select(input_file_name().as("_f"))
          .groupBy(col("_f")).agg(count(lit(1)).as("_n"))
          .agg(max(col("_n"))).collect()(0)
        val perFile = if (r.isNullAt(0)) 1L else math.max(1L, r.getLong(0))
        val target = 10L * perFile
        math.min(1L << 21, math.max(512L, ((target + 31) / 32) * 32)).toInt
      }
    // blooms are probed through the key's canonical LONG string form
    // (bloomPositions); a non-integral column would hash "7.0" at
    // build but "7" at probe — a silent false negative, the one thing
    // a bloom must never produce. Refuse instead.
    bloomCols.foreach { c =>
      val dt = data.schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.ShortType ||
        dt == org.apache.spark.sql.types.ByteType,
        s"buildManifest: bloom column $c must be integral (probe hashes the " +
          s"long's decimal string), got $dt")
    }
    val aggs = count(lit(1)).as("n_rows") +:
      statsCols.flatMap { c =>
        Seq(min(col(c)).cast("long").as(s"${c}_min"),
          max(col(c)).cast("long").as(s"${c}_max"))
      }
    val base = data.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    val emptyArr = expr("CAST(array() AS array<bigint>)")
    val withBlooms = if (bloomCols.isEmpty) base else {
      import graft.operators.CountMinSketch
      // ONE data pass for every bloom column: (column, position)
      // pairs exploded together, null keys dropping out as null
      // positions (md5(null) is null end to end)
      val tagged = data.select(input_file_name().as("file"),
          explode(array(bloomCols.flatMap(c => (0 until bloomK).map(j =>
            struct(lit(c).as("c"),
              CountMinSketch.cellHash(col(c), j, bloomBits).as("pos")))): _*)).as("e"))
        .filter(col("e.pos").isNotNull)
        .select(col("file"), col("e.c").as("c"),
          (col("e.pos") / 32).cast("long").as("widx"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(`e`.`pos` % 32 AS INT))").as("bit"))
        .groupBy(col("file"), col("c"), col("widx")).agg(bit_or(col("bit")).as("word"))
        .groupBy(col("file"), col("c"))
        .agg(sort_array(collect_list(struct(col("widx"), col("word")))).as("_bw"))
        .groupBy(col("file")).pivot("c", bloomCols)
        .agg(first(expr("transform(_bw, x -> x.widx)")).as("widx"),
          first(expr("transform(_bw, x -> x.word)")).as("word"))
      // pivot names columns `<c>_widx`/`<c>_word` (single-agg pivots
      // would drop the suffix; two aggs keep it)
      bloomCols.foldLeft(base.join(tagged, Seq("file"), "left")) { (acc, c) =>
        acc
          .withColumn(s"${c}_bloom_widx", coalesce(col(s"${c}_widx"), emptyArr))
          .withColumn(s"${c}_bloom_word", coalesce(col(s"${c}_word"), emptyArr))
          .drop(s"${c}_widx", s"${c}_word")
          .withColumn(s"${c}_bloom_k", lit(bloomK))
          .withColumn(s"${c}_bloom_m", lit(bloomBits))
      }
    }
    withBlooms
  }

  /** Driver-side replica of [[graft.operators.CountMinSketch.cellHash]]
    * — the SAME md5-split hash evaluated without a Spark job, so the
    * pruning decision can probe stored blooms at plan-build time.
    * Pinned bit-identical to the SQL evaluation in ManifestRuleSpec.
    */
  private[graft] def cellHashLocal(key: String, j: Int, width: Int): Long = {
    val input = if (j < 4) key else s"$key:${j / 4}"
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(input.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(8 * (j % 4), 8 * (j % 4) + 8), 16) % width
  }

  /** Probe positions for one key — `k` cell hashes over the key's
    * canonical string form (the build hashes `CAST(col AS STRING)`).
    * File-independent: compute once per key, probe every file with it.
    */
  private[graft] def bloomPositions(key: Long, k: Int, m: Int): Array[Long] =
    Array.tabulate(k)(j => cellHashLocal(key.toString, j, m))

  /** Are ALL probe positions set in this sparse per-file bloom? False
    * is definitive (no false negatives by construction); true may be a
    * false positive.
    */
  private[graft] def bloomHitsAll(pos: Array[Long],
      widx: Array[Long], words: Array[Long]): Boolean =
    pos.forall { p =>
      val i = java.util.Arrays.binarySearch(widx, p / 32)
      i >= 0 && ((words(i) >> (p % 32).toInt) & 1L) == 1L
    }

  /** (files that could contain ANY of `keys` per the stored per-file
    * blooms, total file count) — the point-lookup sibling of
    * [[prunedFiles]], effective on layouts where the key's min/max
    * band spans every file. Metadata-only, no data file I/O.
    */
  def prunedFilesForPointKeys(spark: SparkSession, path: String, valueCol: String,
      keys: Seq[Long]): (Seq[String], Int) = {
    val m = spark.read.parquet(manifestPath(path))
      .select(col("file"),
        col(s"${valueCol}_bloom_k").as("k"), col(s"${valueCol}_bloom_m").as("m"),
        col(s"${valueCol}_bloom_widx").as("widx"), col(s"${valueCol}_bloom_word").as("word"))
      .collect()
    // positions depend only on (key, k, m) — compute once per key,
    // not once per (key, file): a lake manifest has millions of rows
    val posCache = scala.collection.mutable.Map.empty[(Long, Int, Int), Array[Long]]
    val kept = m.filter { r =>
      // a malformed or partially-written manifest row (any null field,
      // k/m outside the build invariants, ragged parallel arrays) must
      // degrade to "keep the file", never to an NPE or a % 0 — same
      // shape discipline as the automatic rule's reader
      if (r.isNullAt(1) || r.isNullAt(2) || r.isNullAt(3) || r.isNullAt(4)) true
      else {
        val (k, mm) = (r.getInt(1), r.getInt(2))
        val widx = r.getSeq[Long](3).toArray
        val words = r.getSeq[Long](4).toArray
        if (k < 1 || mm < 32 || widx.length != words.length) true
        else keys.exists { key =>
          bloomHitsAll(posCache.getOrElseUpdate((key, k, mm),
            bloomPositions(key, k, mm)), widx, words)
        }
      }
    }.map(_.getString(0)).toSeq
    (kept, m.length)
  }

  /** Point lookup through the per-file blooms: open only the files
    * that might hold one of `keys`, then apply the EXACT key filter —
    * result ≡ `read.parquet(path).filter(col IN keys)` (false
    * positives die at the row filter; no false negatives exist).
    */
  def readPointLookup(spark: SparkSession, path: String, valueCol: String,
      keys: Seq[Long]): DataFrame = {
    val (files, _) = prunedFilesForPointKeys(spark, path, valueCol, keys)
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files: _*).filter(col(valueCol).isin(keys: _*))
  }

  /** (files overlapping [lo, hi] on `valueCol`, total file count) from
    * the stored manifest — a metadata-only decision, no data file I/O.
    * Files whose stats range is entirely below `lo` or above `hi`
    * provably hold no matching row (min/max are exact, not estimates)
    * and are skipped; everything else is kept.
    */
  def prunedFiles(spark: SparkSession, path: String, valueCol: String,
      lo: Long, hi: Long): (Seq[String], Int) = {
    require(lo <= hi, s"prunedFiles: lo=$lo must be <= hi=$hi")
    val m = spark.read.parquet(manifestPath(path))
      .select(col("file"), col(s"${valueCol}_min").as("mn"), col(s"${valueCol}_max").as("mx"))
      .collect()
    val kept = m.filter { r =>
      // null stats (all-null column in that file) can never match a
      // range predicate; skipping such a file is exact, not heuristic
      !r.isNullAt(1) && !r.isNullAt(2) && r.getLong(2) >= lo && r.getLong(1) <= hi
    }.map(_.getString(0)).toSeq
    (kept, m.length)
  }

  /** Files that could contain ANY of `keys` on `valueCol`, per the
    * stored manifest — the point-set analogue of [[prunedFiles]]: a
    * file is kept iff at least one key lands inside its [min, max]
    * (binary search per file over the sorted key set). All-null stats
    * provably match no key; skipping stays exact.
    */
  def prunedFilesForKeys(spark: SparkSession, path: String, valueCol: String,
      keys: Seq[Long]): (Seq[String], Int) = {
    val sorted = keys.distinct.sorted.toArray
    val m = spark.read.parquet(manifestPath(path))
      .select(col("file"), col(s"${valueCol}_min").as("mn"), col(s"${valueCol}_max").as("mx"))
      .collect()
    val kept = m.filter { r =>
      !r.isNullAt(1) && !r.isNullAt(2) && sorted.nonEmpty && {
        val (mn, mx) = (r.getLong(1), r.getLong(2))
        val i = java.util.Arrays.binarySearch(sorted, mn)
        i >= 0 || { val ip = -i - 1; ip < sorted.length && sorted(ip) <= mx }
      }
    }.map(_.getString(0)).toSeq
    (kept, m.length)
  }

  /** JOIN-DRIVEN dynamic file skipping — the runtime sibling of
    * [[readRange]], and the file-grain analogue of dynamic partition
    * pruning: before scanning a fact layout manifested on its join
    * key, collect the (already-filtered) build side's distinct keys
    * with a bounded driver action and open only the files whose
    * [min, max] could hold one of them. Returns a conservative
    * SUPERSET of the fact rows whose `valueCol` is in `dimKeys` (kept
    * files re-filtered to the keys' [min, max] band, plus an exact
    * key-set filter when the set is small) — the caller's join
    * enforces exactness, so the whole rewrite is I/O-only.
    *
    * Scale shape (100 TB): the build side of a selective star join is
    * small by construction (that is why Spark broadcasts it); its
    * distinct key set is one bounded collect, capped at `maxKeys`.
    * Over the cap, the method degrades to [[readRange]] over the TRUE
    * key min/max (computed by aggregate, not from the truncated
    * sample) — band pruning instead of point pruning, never wrong.
    * Like [[readRange]], assumes the manifest covers the layout
    * (build it after writing; the automatic rule in
    * [[graft.plans.ManifestFileSkipping]] is the appends-tolerant
    * path).
    */
  def readForJoin(spark: SparkSession, path: String, valueCol: String,
      dimKeys: org.apache.spark.sql.DataFrame, maxKeys: Int = 100000): DataFrame = {
    require(dimKeys.columns.length == 1, "readForJoin: dimKeys must be a single key column")
    // the key set and the kept-file re-filter both travel as LONGs
    // (manifest stats are long-valued): a fractional key would be
    // silently truncated by the cast and lose matching rows — refuse,
    // mirroring buildManifest's bloom-column check
    def integral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val dimType = dimKeys.schema.fields.head.dataType
    require(integral(dimType),
      s"readForJoin: dim key column must be integral (keys travel as longs), got $dimType")
    val factType = spark.read.parquet(path).schema
      .find(_.name == valueCol).map(_.dataType)
    require(factType.exists(integral),
      s"readForJoin: fact column $valueCol must be integral (manifest bands are " +
        s"long-valued), got ${factType.getOrElse("<absent>")}")
    val distinctKeys = dimKeys
      .select(col(dimKeys.columns.head).cast("long").as("k"))
      .na.drop().distinct()
    val sample = distinctKeys.limit(maxKeys + 1).collect().map(_.getLong(0))
    if (sample.isEmpty)
      spark.read.parquet(path).filter(lit(false)) // no keys: provably empty, schema kept
    else if (sample.length > maxKeys) {
      // over budget: true band from ONE aggregate (the sample is
      // truncated — its extremes would under-cover the key set)
      val r = distinctKeys.agg(min(col("k")), max(col("k"))).head
      readRange(spark, path, valueCol, r.getLong(0), r.getLong(1))
    } else {
      val (files, _) = prunedFilesForKeys(spark, path, valueCol, sample.toSeq)
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else {
        val banded = spark.read.parquet(files: _*)
          .filter(col(valueCol) >= sample.min && col(valueCol) <= sample.max)
        // small key sets also row-filter exactly (drives parquet
        // row-group skipping); big ones stay band-only — either way a
        // superset of the matching rows
        if (sample.length <= 10000) banded.filter(col(valueCol).isin(sample.toSeq: _*))
        else banded
      }
    }
  }

  /** Range scan through the manifest: read ONLY the overlapping files,
    * then re-apply the predicate (skipping is conservative — kept
    * files may still hold non-matching rows). Semantically identical
    * to `spark.read.parquet(path).filter(valueCol between lo and hi)`;
    * physically O(overlapping files).
    */
  def readRange(spark: SparkSession, path: String, valueCol: String,
      lo: Long, hi: Long): DataFrame = {
    val (files, _) = prunedFiles(spark, path, valueCol, lo, hi)
    if (files.isEmpty)
      // provably-empty result: keep the scan's schema without reading a
      // row group (the pushed-down false predicate skips them all)
      spark.read.parquet(path).filter(lit(false))
    else
      spark.read.parquet(files: _*)
        .filter(col(valueCol) >= lo && col(valueCol) <= hi)
  }
}
