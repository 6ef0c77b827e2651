package graft

import graft.plans.ManifestPrunedFileIndex
import graft.sources.ManifestScan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.col

/** The AUTOMATIC file-skipping rule (graft.plans.ManifestFileSkipping):
  * a plain `read.parquet(path).filter(range)` over a `_graft_manifest`
  * layout must open only the overlapping files — and must never change
  * results, whatever the manifest knows or doesn't.
  */
class ManifestRuleSpec extends SparkSpec {

  private val tmpBase = System.getProperty("java.io.tmpdir")

  private def docs = Tables.load(spark, TestSpark.sf0001, "documents")
    .select(col("doc_id"), col("n_chars"))

  /** The executed scan's FileIndex, descending through AQE wrappers. */
  private def scanIndex(df: DataFrame) =
    TestSpark.findExec[FileSourceScanExec](df.queryExecution.executedPlan)
      .getOrElse(fail("no FileSourceScanExec in the executed plan"))
      .relation.location

  private def dataFilesOnDisk(path: String): Int =
    new java.io.File(path).listFiles().count(f =>
      f.isFile && f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  // range-clustered layout: files partition the n_chars axis, so a
  // selective range must prune
  private lazy val byValue: String = {
    val p = s"$tmpBase/graft_mrule_value"
    docs.repartitionByRange(8, col("n_chars")).write.mode("overwrite").parquet(p)
    ManifestScan.buildManifest(spark, p, Seq("n_chars"))
    p
  }

  test("declarative range filter prunes files through the stored manifest") {
    val total = dataFilesOnDisk(byValue)
    assert(total >= 8, s"staging must produce >= 8 files, got $total")
    val df = spark.read.parquet(byValue)
      .filter(col("n_chars") >= 200L && col("n_chars") <= 260L)
    val idx = scanIndex(df)
    assert(idx.isInstanceOf[ManifestPrunedFileIndex],
      s"scan must plan over the pruned index, got ${idx.getClass.getSimpleName}")
    val read = idx.listFiles(Nil, Nil).map(_.files.size).sum
    assert(read > 0 && read < total,
      s"selective range must read strictly fewer files: $read of $total")
    // and the rewrite is plan-only: rule-on ≡ rule-off, row for row
    val got = rows(df)
    spark.conf.set(plans.ManifestFileSkipping.EnabledKey, "false")
    val expect = try rows(spark.read.parquet(byValue)
      .filter(col("n_chars") >= 200L && col("n_chars") <= 260L))
    finally spark.conf.unset(plans.ManifestFileSkipping.EnabledKey)
    assert(got == expect, "pruned scan must equal the unpruned scan")
    assert(expect == rows(docs.filter(col("n_chars").between(200, 260))),
      "both must equal the source-of-truth filter")
  }

  test("one-sided strict bound prunes; uncorrelated predicate plans unwrapped") {
    // n_chars > hi-edge: strict one-sided bound still skips low files
    val strict = spark.read.parquet(byValue).filter(col("n_chars") > 600L)
    val idx = scanIndex(strict)
    assert(idx.isInstanceOf[ManifestPrunedFileIndex], "strict > must prune")
    assert(rows(strict) == rows(docs.filter(col("n_chars") > 600)))

    // doc_id has no stats in this manifest: no pruning, and the plan
    // keeps the ORIGINAL index (no pointless wrapper)
    val uncorr = spark.read.parquet(byValue).filter(col("doc_id") <= 50L)
    assert(!scanIndex(uncorr).isInstanceOf[ManifestPrunedFileIndex],
      "a predicate without manifest stats must leave the scan untouched")
    assert(rows(uncorr) == rows(docs.filter(col("doc_id") <= 50)))
  }

  test("infeasible and out-of-range predicates read zero files, schema intact") {
    Seq(
      // disjoint conjuncts: lo > hi after intersection
      spark.read.parquet(byValue).filter(col("n_chars") >= 500L && col("n_chars") <= 100L),
      // beyond every file's max
      spark.read.parquet(byValue).filter(col("n_chars") >= 1000000L)
    ).foreach { df =>
      assert(df.count() == 0)
      assert(df.columns.toSeq == Seq("doc_id", "n_chars"))
      val idx = scanIndex(df)
      if (idx.isInstanceOf[ManifestPrunedFileIndex])
        assert(idx.listFiles(Nil, Nil).map(_.files.size).sum == 0,
          "provably-empty range must list zero files")
    }
  }

  test("files appended after the manifest build are always kept (stale-safe)") {
    val p = s"$tmpBase/graft_mrule_stale"
    docs.filter(col("doc_id") % 2 === 0)
      .repartitionByRange(4, col("n_chars")).write.mode("overwrite").parquet(p)
    ManifestScan.buildManifest(spark, p, Seq("n_chars"))
    // append the odd half AFTER the manifest: unknown to it, must never
    // be skipped, whatever the predicate
    docs.filter(col("doc_id") % 2 === 1)
      .repartition(2).write.mode("append").parquet(p)
    val got = rows(spark.read.parquet(p)
      .filter(col("n_chars") >= 200L && col("n_chars") <= 400L))
    assert(got == rows(docs.filter(col("n_chars").between(200, 400))),
      "appended (unmanifested) files must survive pruning")
  }

  test("join-driven dynamic skipping opens only the key-overlapping files") {
    import org.apache.spark.sql.functions.lit
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val p = s"$tmpBase/graft_mrule_dyn"
    orders.repartitionByRange(8, col("o_custkey")).write.mode("overwrite").parquet(p)
    ManifestScan.buildManifest(spark, p, Seq("o_custkey"))
    val total = dataFilesOnDisk(p)
    assert(total >= 8, s"staging must produce >= 8 files, got $total")

    // two keys from opposite ends of the clustered axis: at most two
    // files can hold them
    val Array(kLo, kHi) = orders.agg(
      org.apache.spark.sql.functions.min("o_custkey"),
      org.apache.spark.sql.functions.max("o_custkey")).head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val dim = spark.range(2).select(
      org.apache.spark.sql.functions.when(col("id") === 0, kLo).otherwise(kHi).as("k"))
    val pruned = ManifestScan.readForJoin(spark, p, "o_custkey", dim)
    assert(pruned.inputFiles.length >= 1 && pruned.inputFiles.length <= 2,
      s"two point keys must open at most two of $total files, opened ${pruned.inputFiles.length}")
    assert(rows(pruned.select(col("o_orderkey"), col("o_custkey"))) ==
      rows(orders.filter(col("o_custkey").isin(kLo, kHi))
        .select(col("o_orderkey"), col("o_custkey"))),
      "point-pruned read must hold exactly the matching rows (superset re-filtered)")

    // over-budget degrade: maxKeys=1 with two keys must fall back to
    // the TRUE [min,max] band (computed by aggregate) — a superset
    val band = ManifestScan.readForJoin(spark, p, "o_custkey", dim, maxKeys = 1)
    val bandKeys = band.select(col("o_custkey")).distinct().collect().map(_.getLong(0))
    assert(bandKeys.contains(kLo) && bandKeys.contains(kHi),
      "band fallback must cover both keys (truncated-sample extremes would not)")

    // empty dim: provably-empty scan, schema intact
    val none = ManifestScan.readForJoin(spark, p, "o_custkey",
      dim.filter(lit(false)))
    assert(none.count() == 0 &&
      none.columns.toSeq == Seq("o_orderkey", "o_custkey", "o_totalprice"))
  }

  test("driver-side cell hash replays the SQL hash family bit for bit") {
    import org.apache.spark.sql.functions.lit
    val keys = Seq(0L, 1L, 7L, -42L, 499L, 123456789L, Long.MaxValue, Long.MinValue + 1)
    (0 until 6).foreach { j =>
      val sql = spark.range(1).select(
        keys.map(k => graft.operators.CountMinSketch.cellHash(lit(k), j, 16384)): _*)
        .head().toSeq.map(_.asInstanceOf[Long])
      val local = keys.map(k => ManifestScan.cellHashLocal(k.toString, j, 16384))
      assert(sql == local, s"j=$j: SQL $sql != local $local")
    }
  }

  test("bloom point lookup skips to the key-holding files on a mis-clustered layout") {
    // clustered by n_chars: every file's doc_id band spans the whole
    // domain — min/max skipping can do NOTHING here, blooms must
    val p = s"$tmpBase/graft_mrule_bloom"
    docs.repartitionByRange(16, col("n_chars")).write.mode("overwrite").parquet(p)
    ManifestScan.buildManifest(spark, p, Seq("n_chars"), Seq("doc_id"))
    val total = dataFilesOnDisk(p)
    assert(total >= 16, s"staging must produce >= 16 files, got $total")

    // declarative form through the optimizer rule
    val df = spark.read.parquet(p).filter(col("doc_id").isin(7L, 77L, 142L))
    val idx = scanIndex(df)
    assert(idx.isInstanceOf[ManifestPrunedFileIndex],
      "IN over a bloomed column must prune through the rule")
    val read = idx.listFiles(Nil, Nil).map(_.files.size).sum
    assert(read >= 1 && read <= 3,
      s"three point keys must open at most three of $total files, opened $read")
    assert(rows(df) == rows(docs.filter(col("doc_id").isin(7L, 77L, 142L))),
      "bloom-pruned scan must equal the full-scan filter")

    // the explicit API agrees with the rule
    val api = ManifestScan.readPointLookup(spark, p, "doc_id", Seq(7L, 77L, 142L))
    assert(api.inputFiles.length == read, "API and rule must keep the same files")
    assert(rows(api) == rows(df))

    // equality conjunct: one key, at most one file
    val one = spark.read.parquet(p).filter(col("doc_id") === 142L)
    val oneIdx = scanIndex(one)
    assert(oneIdx.isInstanceOf[ManifestPrunedFileIndex] &&
      oneIdx.listFiles(Nil, Nil).map(_.files.size).sum <= 1,
      "a single equality key must open at most one file")
    assert(rows(one) == rows(docs.filter(col("doc_id") === 142L)))

    // absent key: no rows, and (modulo bloom false positives) no files
    val absent = ManifestScan.readPointLookup(spark, p, "doc_id", Seq(999999L))
    assert(absent.count() == 0)

    // 12 keys: past spark.sql.optimizer.inSetConversionThreshold (10),
    // OptimizeIn rewrites In -> InSet in the same fixed-point batch —
    // skipping must survive the rewrite (the InSet case in intervalsOf)
    val manyKeys = (1L to 12L).map(_ * 37L)
    val inset = spark.read.parquet(p).filter(col("doc_id").isin(manyKeys: _*))
    val inIdx = scanIndex(inset)
    assert(inIdx.isInstanceOf[ManifestPrunedFileIndex],
      "a 12-key IN (rewritten to InSet) must still prune through the rule")
    assert(inIdx.listFiles(Nil, Nil).map(_.files.size).sum <= manyKeys.length,
      "12 point keys must open at most 12 files")
    assert(rows(inset) == rows(docs.filter(col("doc_id").isin(manyKeys: _*))))

    // disjoint IN lists: Catalyst's ConstantPropagation folds plain
    // contradictory EQUALITIES to an empty LocalRelation before this
    // rule runs, but leaves IN∩IN to us — the empty point
    // intersection must prove every manifested file skippable
    val contra = spark.read.parquet(p)
      .filter(col("doc_id").isin(7L, 8L) && col("doc_id").isin(77L, 88L))
    assert(contra.count() == 0)
    val cIdx = scanIndex(contra)
    assert(cIdx.isInstanceOf[ManifestPrunedFileIndex],
      "disjoint IN lists must prune through the rule")
    assert(cIdx.listFiles(Nil, Nil).map(_.files.size).sum == 0,
      "an empty point intersection must list zero files")
  }

  test("z-order box disjunction prunes files as an interval-set constraint") {
    import graft.operators.ZOrder
    import org.apache.spark.sql.functions.expr
    val staged = Tables.load(spark, TestSpark.sf0001, "customer")
      .select(col("c_custkey"),
        ZOrder.cellId(col("c_acctbal"), -1000, 10000, 8).as("cx"),
        expr("(c_custkey * 53 % 4096) div 16").as("cy"))
      .withColumn("z", ZOrder.interleave(col("cx"), col("cy"), 8))
    val p = s"$tmpBase/graft_mrule_zbox"
    staged.repartitionByRange(16, col("z")).sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(p)
    ManifestScan.buildManifest(spark, p, Seq("z"))
    val total = dataFilesOnDisk(p)
    assert(total >= 8, s"staging must produce >= 8 files, got $total")

    // quadrant-aligned box: 3 covering z-ranges spanning ~9% of the
    // z domain — most z-sorted files must provably miss all three
    val ranges = ZOrder.zQueryRanges(32, 95, 64, 127, bits = 8)
    assert(ranges.length <= 8, s"probe box must stay small: ${ranges.length} ranges")
    val pred = ranges.map { case (lo, hi) => col("z").between(lo, hi) }.reduce(_ || _)
    val df = spark.read.parquet(p).filter(pred)
    val idx = scanIndex(df)
    assert(idx.isInstanceOf[ManifestPrunedFileIndex],
      "a same-column OR of BETWEENs must prune through the rule")
    val read = idx.listFiles(Nil, Nil).map(_.files.size).sum
    assert(read < total, s"box probe must skip z-sorted files: read $read of $total")
    // decomposition + skipping together still answer the RAW box
    assert(rows(df.select(col("c_custkey"))) ==
      rows(staged.filter(col("cx").between(32, 95) && col("cy").between(64, 127))
        .select(col("c_custkey"))),
      "pruned z-range scan must equal the raw box filter")
  }

  test("auto-sized blooms keep skipping at per-file key counts that saturate a fixed m") {
    // 200k uniform ids over 8 files = 25k keys/file: a fixed 16384-bit
    // bloom holds 75k set bits' worth of hashing — saturated, every
    // file kept. Auto-sizing (~10 bits/key) must keep point skipping
    // alive. Layout clustered by the hash column so id bands are
    // useless (the bloom is the only signal).
    import org.apache.spark.sql.functions.pmod
    val p = s"$tmpBase/graft_mrule_autosize"
    spark.range(200000L).select(col("id"),
        pmod(col("id") * org.apache.spark.sql.functions.lit(2654435761L),
          org.apache.spark.sql.functions.lit(1000000L)).as("v"))
      .repartitionByRange(8, col("v")).write.mode("overwrite").parquet(p)
    ManifestScan.buildManifest(spark, p, Seq("v"), Seq("id")) // bloomBits = 0 -> auto
    val total = dataFilesOnDisk(p)
    val df = spark.read.parquet(p).filter(col("id").isin(3L, 100000L, 199997L))
    val idx = scanIndex(df)
    assert(idx.isInstanceOf[ManifestPrunedFileIndex],
      "auto-sized blooms must prune a saturating key count")
    val read = idx.listFiles(Nil, Nil).map(_.files.size).sum
    assert(read < total,
      s"3 needles over 25k-key files must not open everything: $read of $total")
    assert(df.count() == 3)
  }

  test("incremental manifest refresh covers appends; run-twice appends nothing") {
    val p = s"$tmpBase/graft_mrule_refresh"
    docs.filter(col("doc_id") % 2 === 0)
      .repartitionByRange(6, col("n_chars")).write.mode("overwrite").parquet(p)
    ManifestScan.buildManifest(spark, p, Seq("n_chars"))
    val gen1Rows = spark.read.parquet(s"$p/${ManifestScan.ManifestDir}").count()

    docs.filter(col("doc_id") % 2 === 1)
      .repartitionByRange(6, col("n_chars")).write.mode("append").parquet(p)
    val covered = ManifestScan.refreshManifest(spark, p, Seq("n_chars"))
    assert(covered >= 6, s"refresh must cover the appended generation, got $covered")
    val gen2Rows = spark.read.parquet(s"$p/${ManifestScan.ManifestDir}").count()
    assert(gen2Rows == gen1Rows + covered, "one manifest row per new data file")

    // idempotence: nothing new -> nothing appended
    assert(ManifestScan.refreshManifest(spark, p, Seq("n_chars")) == 0)
    assert(spark.read.parquet(s"$p/${ManifestScan.ManifestDir}").count() == gen2Rows,
      "run-twice must equal run-once")

    // the refreshed manifest prunes across BOTH generations and the
    // read equals the source-of-truth filter
    val df = spark.read.parquet(p)
      .filter(col("n_chars") >= 300L && col("n_chars") <= 400L)
    val idx = scanIndex(df)
    assert(idx.isInstanceOf[ManifestPrunedFileIndex],
      "the refreshed manifest must drive pruning")
    val total = dataFilesOnDisk(p)
    val read = idx.listFiles(Nil, Nil).map(_.files.size).sum
    assert(read < total, s"selective range must skip files of both generations: $read of $total")
    assert(rows(df) == rows(docs.filter(col("n_chars").between(300, 400))))

    // changing the column set mid-manifest is refused (mixed schema),
    // BEFORE any job over the new data runs
    docs.limit(10).repartition(1).write.mode("append").parquet(p)
    intercept[IllegalArgumentException] {
      ManifestScan.refreshManifest(spark, p, Seq("n_chars"), bloomCols = Seq("doc_id"))
    }
  }

  test("zero-row data files get synthesized manifest rows; refresh stays idempotent") {
    val p = s"$tmpBase/graft_mrule_emptyfile"
    docs.repartitionByRange(4, col("n_chars")).write.mode("overwrite").parquet(p)
    ManifestScan.buildManifest(spark, p, Seq("n_chars"))
    // plant a ZERO-ROW part file (an empty streaming micro-batch /
    // compaction leftover): write one elsewhere and copy it in
    val src = s"$tmpBase/graft_mrule_emptysrc"
    docs.limit(0).repartition(1).write.mode("overwrite").parquet(src)
    val parts = new java.io.File(src).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parts.nonEmpty, "staging an empty parquet write must leave a part file")
    val target = new java.io.File(p, s"part-empty-${parts.head.getName}")
    java.nio.file.Files.copy(parts.head.toPath, target.toPath)

    val covered = ManifestScan.refreshManifest(spark, p, Seq("n_chars"))
    assert(covered == 1, s"the empty file must be covered once, got $covered")
    // idempotence MUST survive the zero-row file (manifestFrame alone
    // would never emit a row for it and re-cover it forever)
    assert(ManifestScan.refreshManifest(spark, p, Seq("n_chars")) == 0,
      "second refresh must find nothing new")
    // the synthesized row is exact: all-null stats -> provably skipped
    val df = spark.read.parquet(p)
      .filter(col("n_chars") >= 200L && col("n_chars") <= 300L)
    assert(rows(df) == rows(docs.filter(col("n_chars").between(200, 300))))
    val idx = scanIndex(df)
    assert(idx.isInstanceOf[ManifestPrunedFileIndex] &&
      !idx.listFiles(Nil, Nil).flatMap(_.files)
        .exists(_.getPath.getName.startsWith("part-empty-")),
      "the zero-row file must be skipped, not merely kept as unknown")
  }

  test("broadcast join prunes manifested fact files at runtime (dynamic rule)") {
    import org.apache.spark.sql.functions.{broadcast, when}
    val DynRule = org.apache.spark.sql.execution.graftdpp.DynamicManifestFileSkipping
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val p = s"$tmpBase/graft_mrule_dynauto"
    orders.repartitionByRange(8, col("o_custkey")).write.mode("overwrite").parquet(p)
    ManifestScan.buildManifest(spark, p, Seq("o_custkey"))
    val total = dataFilesOnDisk(p)
    assert(total >= 8, s"staging must produce >= 8 files, got $total")

    val r = orders.agg(
      org.apache.spark.sql.functions.min("o_custkey"),
      org.apache.spark.sql.functions.max("o_custkey")).head()
    val (kLo, kHi) = (r.getLong(0), r.getLong(1))
    def dim = spark.range(2).select(when(col("id") === 0, kLo).otherwise(kHi).as("k"))
    // the PLAIN declarative join — no readForJoin; the AQE rule must
    // prune once the broadcast materializes
    def joined = broadcast(dim)
      .join(spark.read.parquet(p), col("k") === col("o_custkey"))
      .select(col("o_orderkey"), col("o_custkey"))
    val df = joined
    val got = rows(df) // execute first: AQE finalizes, broadcast keys exist
    val scan = TestSpark.findExec[FileSourceScanExec](df.queryExecution.executedPlan)
      .getOrElse(fail("no FileSourceScanExec in the executed plan"))
    scan.relation.location match {
      case m: ManifestPrunedFileIndex =>
        assert(m.isDynamic, "the runtime rule must mark its wrap dynamic")
        val read = m.listFiles(Nil, Nil).map(_.files.size).sum
        assert(read >= 1 && read <= 2,
          s"two point keys from opposite ends must open at most two of $total files, opened $read")
      case other => fail(s"fact scan must plan over the dynamically pruned index, got ${other.getClass.getSimpleName}")
    }
    // the rewrite is I/O-only: rule-on ≡ rule-off ≡ source-of-truth filter
    spark.conf.set(DynRule.EnabledKey, "false")
    val off = try rows(joined) finally spark.conf.unset(DynRule.EnabledKey)
    assert(got == off, "dynamic pruning must not change join results")
    assert(got == rows(orders.filter(col("o_custkey").isin(kLo, kHi))
      .select(col("o_orderkey"), col("o_custkey"))))

    // a LEFT OUTER join must NOT prune the streamed side (unmatched
    // fact rows survive) — safety gate, not an optimization miss
    val outer = spark.read.parquet(p)
      .join(broadcast(dim), col("o_custkey") === col("k"), "left_outer")
    assert(outer.count() == orders.count(),
      "outer join must keep every fact row")
    TestSpark.findExec[FileSourceScanExec](outer.queryExecution.executedPlan)
      .foreach { s =>
        s.relation.location match {
          case m: ManifestPrunedFileIndex =>
            assert(!m.isDynamic, "outer join must not be dynamically pruned")
          case _ =>
        }
      }
  }

  test("multi-key broadcast join prunes on every manifested key (packed and wide tuples)") {
    import org.apache.spark.sql.functions.broadcast
    val DynRule = org.apache.spark.sql.execution.graftdpp.DynamicManifestFileSkipping
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")

    // PACKED form: two int keys (4+4 bytes) — HashJoin.rewriteKeyExpr
    // stores one width-shifted long per tuple; the rule must unpack
    def stagePacked(p: String): Unit = {
      orders.select(col("o_orderkey"),
          col("o_custkey").cast("int").as("ok"),
          (col("o_orderkey") % 8).cast("int").as("ob"))
        .repartitionByRange(8, col("ok"))
        .write.mode("overwrite").parquet(p)
      ManifestScan.buildManifest(spark, p, Seq("ok", "ob"))
    }
    // WIDE form: two long keys (8+8 bytes > 8) — not rewritable, the
    // broadcast keeps one field per key; the rule reads fields directly
    def stageWide(p: String): Unit = {
      orders.select(col("o_orderkey"),
          col("o_custkey").as("ok"),
          (col("o_orderkey") % 8).as("ob"))
        .repartitionByRange(8, col("ok"))
        .write.mode("overwrite").parquet(p)
      ManifestScan.buildManifest(spark, p, Seq("ok", "ob"))
    }

    val r = orders.agg(
      org.apache.spark.sql.functions.min("o_custkey"),
      org.apache.spark.sql.functions.max("o_custkey")).head()
    val (kLo, kHi) = (r.getLong(0), r.getLong(1))

    for ((stage, castTo, tag) <- Seq(
        (stagePacked _, "int", "packed"), (stageWide _, "bigint", "wide"))) {
      val p = s"$tmpBase/graft_mrule_multikey_$tag"
      stage(p)
      val total = dataFilesOnDisk(p)
      assert(total >= 8, s"[$tag] staging must produce >= 8 files, got $total")
      def dim = spark.range(2)
        .select((col("id") * (kHi - kLo) + kLo).cast(castTo).as("ck"),
          ((col("id") * (kHi - kLo) + kLo) % 8).cast(castTo).as("cb"))
      def joined = broadcast(dim)
        .join(spark.read.parquet(p), col("ok") === col("ck") && col("ob") === col("cb"))
        .select(col("o_orderkey"), col("ok"), col("ob"))
      val df = joined
      val got = rows(df) // execute first: broadcast keys exist after AQE finalizes
      val scan = TestSpark.findExec[org.apache.spark.sql.execution.FileSourceScanExec](
        df.queryExecution.executedPlan)
        .getOrElse(fail(s"[$tag] no FileSourceScanExec in the executed plan"))
      scan.relation.location match {
        case m: ManifestPrunedFileIndex =>
          assert(m.isDynamic, s"[$tag] the runtime rule must mark its wrap dynamic")
          val read = m.listFiles(Nil, Nil).map(_.files.size).sum
          assert(read >= 1 && read <= 2,
            s"[$tag] two extreme custkeys must open at most two of $total files, opened $read")
        case other => fail(s"[$tag] fact scan must plan over the dynamically pruned " +
          s"index, got ${other.getClass.getSimpleName}")
      }
      spark.conf.set(DynRule.EnabledKey, "false")
      val off = try rows(joined) finally spark.conf.unset(DynRule.EnabledKey)
      assert(got == off, s"[$tag] multi-key dynamic pruning must not change join results")
      // source of truth: the two-key filter over the raw staged table
      val truth = rows(spark.read.parquet(p)
        .filter((col("ok") === kLo && col("ob") === kLo % 8) ||
          (col("ok") === kHi && col("ob") === kHi % 8))
        .select(col("o_orderkey"), col("ok"), col("ob")))
      assert(got == truth, s"[$tag] must equal the source-of-truth two-key filter")
    }
  }

  test("streaming manifested sink keeps skipping live across micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    val outP = s"$tmpBase/graft_mrule_stream_out"
    val ckpt = s"$tmpBase/graft_mrule_stream_ckpt"
    val inP = s"$tmpBase/graft_mrule_stream_in"
    Seq(outP, ckpt, inP).foreach(LocalFs.deleteRec)
    // two arrival files + maxFilesPerTrigger=1 -> two micro-batches,
    // each appended AND manifested by the foreachBatch sink
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(inP)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(inP)
    val schema = spark.read.parquet(inP).schema
    def runStream(): Unit = {
      val sq = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inP)
        .writeStream
        .foreachBatch(ManifestScan.manifestedSink(outP, Seq("n_chars"),
          layout = _.repartitionByRange(3, col("n_chars"))))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination()
    }
    runStream()
    val mPath = s"$outP/${ManifestScan.ManifestDir}"
    val mRows = spark.read.parquet(mPath).count()
    val total = dataFilesOnDisk(outP)
    assert(total >= 2, s"two micro-batches must land >= 2 data files, got $total")
    assert(mRows == total, s"every streamed file must be manifested: $mRows of $total")

    // skipping is live immediately: the declarative range read prunes
    val df = spark.read.parquet(outP)
      .filter(col("n_chars") >= 200L && col("n_chars") <= 300L)
    val idx = scanIndex(df)
    assert(idx.isInstanceOf[ManifestPrunedFileIndex],
      "a streamed-in table must prune right after AvailableNow completes")
    assert(idx.listFiles(Nil, Nil).map(_.files.size).sum < total,
      "selective range must skip some streamed files")
    assert(rows(df) == rows(docs.filter(col("n_chars").between(200, 300))),
      "streamed+manifested table must equal the source-of-truth filter")

    // run-twice ≡ run-once: the checkpointed re-run replays nothing
    runStream()
    assert(spark.read.parquet(mPath).count() == mRows &&
      dataFilesOnDisk(outP) == total,
      "a finished AvailableNow re-run must append no data and no manifest rows")
  }

  test("compaction rewrites small files into clustered ones and rebuilds the manifest") {
    val p = s"$tmpBase/graft_mrule_compact"
    LocalFs.deleteRec(p)
    // 8 tiny hash-sliced appends: the streaming-ingestion debris shape
    (0 until 8).foreach { i =>
      docs.filter(col("doc_id") % 8 === i)
        .coalesce(1).write.mode("append").parquet(p)
    }
    ManifestScan.buildManifest(spark, p, Seq("n_chars"))
    val before = dataFilesOnDisk(p)
    assert(before >= 8, s"staging must produce >= 8 files, got $before")
    val expect = rows(docs)

    val (b, a) = ManifestScan.compact(spark, p, Seq("n_chars"),
      numFiles = 2, orderBy = Some("n_chars"))
    assert(b == before && a == 2, s"compact must report ($before, 2), got ($b, $a)")
    assert(dataFilesOnDisk(p) == 2, "exactly the compacted generation remains")
    assert(!new java.io.File(p, "_graft_compact").exists(),
      "the staging dir must be cleaned up")
    assert(rows(spark.read.parquet(p).select(col("doc_id"), col("n_chars"))) == expect,
      "compaction must preserve every row")
    assert(spark.read.parquet(s"$p/${ManifestScan.ManifestDir}").count() == 2,
      "the manifest must be rebuilt to one row per compacted file")

    // the rewrite range-clusters on n_chars: a selective band now
    // prunes even though the staged layout was uncorrelated
    val df = spark.read.parquet(p)
      .filter(col("n_chars") >= 200L && col("n_chars") <= 260L)
    val idx = scanIndex(df)
    assert(idx.isInstanceOf[ManifestPrunedFileIndex] &&
      idx.listFiles(Nil, Nil).map(_.files.size).sum < 2,
      "post-compact clustering must make band skipping effective")
    assert(rows(df) == rows(docs.filter(col("n_chars").between(200, 260))))

    // already-compact layouts are a no-op (returns unchanged counts)
    assert(ManifestScan.compact(spark, p, Seq("n_chars"), numFiles = 2) == ((2, 2)))
    assert(dataFilesOnDisk(p) == 2)
  }

  test("SQL over a registered graft table prunes through the manifest rule") {
    graft.plans.GraftTables.register("mrule_docs", byValue)
    val sql =
      "SELECT doc_id, n_chars FROM graft.mrule_docs WHERE n_chars BETWEEN 200 AND 260"
    val df = spark.sql(sql)
    val idx = scanIndex(df)
    assert(idx.isInstanceOf[ManifestPrunedFileIndex],
      "named-table SQL must plan over the pruned index")
    val total = dataFilesOnDisk(byValue)
    assert(idx.listFiles(Nil, Nil).map(_.files.size).sum < total,
      "named-table SQL must open fewer files")
    // path-based and named access are ONE read path: row-identical
    assert(rows(df) == rows(spark.read.parquet(byValue)
      .filter(col("n_chars") >= 200L && col("n_chars") <= 260L)))
    // unregistered names keep the ordinary analyzer error
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft.no_such_table").collect()
    }
  }

  test("unmanifested layouts and disabled sessions plan unchanged") {
    val p = s"$tmpBase/graft_mrule_plain"
    docs.repartitionByRange(4, col("n_chars")).write.mode("overwrite").parquet(p)
    val plain = spark.read.parquet(p).filter(col("n_chars") >= 200L && col("n_chars") <= 260L)
    assert(!scanIndex(plain).isInstanceOf[ManifestPrunedFileIndex],
      "no manifest -> no rewrite")

    spark.conf.set(plans.ManifestFileSkipping.EnabledKey, "false")
    try {
      val off = spark.read.parquet(byValue)
        .filter(col("n_chars") >= 200L && col("n_chars") <= 260L)
      assert(!scanIndex(off).isInstanceOf[ManifestPrunedFileIndex],
        "disabled session -> no rewrite")
    } finally spark.conf.unset(plans.ManifestFileSkipping.EnabledKey)
  }
}
