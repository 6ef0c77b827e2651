package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Scale-curve harness (round-15 judge ask): turns the "100×-safe"
  * plan claims from scaladoc micro-probes into a COMMITTED, re-runnable
  * artifact. One `runMain graft.ScaleCurve` re-derives `SCALE.md`.
  *
  * Method: the sf0.1 fixture is amplified ×4 and ×16 as a union of
  * id-shifted replicas (testdata is read-only, so replicas materialize
  * under java.io.tmpdir in the same parquet layout and queries run
  * against the temp dir unchanged). Replication is FK-consistent —
  * every key column shifts by the same per-replica offset on both
  * sides of every join — and content-decorrelated where content drives
  * pairing: `documents.text` words are salted per replica and
  * `embeddings` flip a deterministic per-(dim, replica) sign pattern,
  * because 16 byte-identical copies of a corpus would make every
  * near-dup/cosine operator quadratic in REPLICA MULTIPLICITY — a
  * property of copy-amplification, not of the operator, and not of a
  * real 16× corpus (which grows mostly-new content).
  *
  * For each of the 12 most expensive non-ML-fit queries (BENCH_r15
  * ranking), the query runs at ×1/×4/×16 and the scaling exponent is
  * the least-squares slope of log t vs log n. Exponent ≤ ~1.2 ≈
  * linear-to-n-log-n (job overhead at ×1 biases the fit DOWN, so the
  * threshold carries headroom); anything above flags in SCALE.md.
  *
  * Exclusions (stated in the artifact): MLlib fit queries (rf / gbt /
  * cv / tvs / pipeline_accidents) — their cost is the iterative fit,
  * not a data-plan property — and q_ml_label_agreement_brute, the
  * DELIBERATE brute-force calibration oracle whose production sibling
  * (q_ml_label_agreement, IVF) is the scale path.
  */
object ScaleCurve {

  /** The 12 most expensive non-ML-fit queries of BENCH_r15. */
  val queriesUnderTest: Seq[String] = Seq(
    "q_graph_pagerank", "q_graph_pagerank_dangling", "q_graph_khop",
    "q_text_cosine_pairs", "q_graph_ppr", "q_graph_kcore",
    "q_diag_join_size", "q_graph_modularity", "q_dedup_canonical",
    "q_graph_link_prediction", "q_ml_group_split", "q_basket_rules")

  /** Per-table key columns to shift per replica. Int-typed dimension
    * keys (nation/region) shift by 1000 per replica, long fact keys by
    * 1e9 — both far above any fixture key range, so replicas never
    * collide and never cross-join.
    */
  private val intShift = 1000L
  private val longShift = 1000000000L
  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** One replica of `name` with every key shifted; replica 0 is the
    * identity, so ×1 ⊂ ×4 ⊂ ×16 row-wise.
    */
  private def replica(df: DataFrame, name: String, r: Int): DataFrame = {
    if (r == 0) return df
    val shifted = keyCols(name).foldLeft(df) { (d, k) =>
      val isInt = d.schema(k).dataType == org.apache.spark.sql.types.IntegerType
      val off = if (isInt) intShift * r else longShift * r
      d.withColumn(k, (col(k) + lit(off)).cast(d.schema(k).dataType))
    }
    name match {
      case "documents" =>
        // salt every word: within-replica duplicate structure is
        // preserved, cross-replica content is disjoint — the corpus
        // grows NEW text, like a real corpus does
        shifted
          .withColumn("text", when(col("text").isNull, lit(null: String))
            .otherwise(array_join(
              transform(split(col("text"), " "), w => concat(w, lit(s"_r$r"))), " ")))
          .withColumn("n_chars", when(col("text").isNull, lit(null).cast("long"))
            .otherwise(length(col("text")).cast("long")))
      case "embeddings" =>
        // deterministic per-(dim, replica) sign flip: norms unchanged,
        // replicas decorrelated (E[cos] ≈ 0 across replicas), within-
        // replica geometry exactly preserved
        shifted.withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            when(pmod(hash(i, lit(r)), lit(2)) === 0, x).otherwise(-x)))
      case _ => shifted
    }
  }

  /** Materialize the ×k amplification of `srcDir` under `outDir` in the
    * standard `<table>.parquet` layout.
    */
  def amplify(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit =
    Tables.names.foreach { name =>
      val base = Tables.load(spark, srcDir, name)
      val amped = (0 until k).map(r => replica(base, name, r)).reduce(_.unionByName(_))
      amped.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }

  /** SKEW PROBE: the one scale risk the query matrix above cannot
    * show — sf0.1's key distribution is benign, so the per-key
    * straggler of the sort-merge as-of never fires there. This probe
    * builds a synthetic hot corpus (80% of all left rows on ONE key,
    * the rest over 1024 cold keys, right side 50k rows with the same
    * 80/20 split) at three sizes and times the three execution paths
    * of the same join: plain native sort-merge (the straggler victim),
    * the X195 bucketed rewrite, and X207's auto-selection (whose
    * histogram pass is visible as its overhead). A `sum(v)`
    * differential across the three paths guards the measurement —
    * a fast-but-wrong rewrite fails the probe, not just the spec.
    * Replayable data (spark.range + hash arithmetic), no files.
    */
  private def skewProbe(spark: SparkSession, passes: Int): String = {
    import graft.operators.SkewAsOfJoin
    import graft.plans.NativeAsOfJoin
    val day = 86400000000L
    def corpus(n: Long): (DataFrame, DataFrame) = {
      val hot = n * 8 / 10
      val left = spark.range(n).select(
        when(col("id") < hot, lit("H"))
          .otherwise(concat(lit("k"), pmod(col("id"), lit(1024L)))).as("k"),
        pmod(col("id") * lit(2654435761L), lit(day)).as("t"),
        col("id"))
      val right = spark.range(50000L).select(
        when(col("id") < 40000L, lit("H"))
          .otherwise(concat(lit("k"), pmod(col("id"), lit(1024L)))).as("k"),
        pmod(col("id") * lit(40503L), lit(day)).as("rt"),
        (col("id") * 3L).as("v"))
      (left, right)
    }
    // (match-sum, matched-count, total rows): sum alone is blind to
    // lost/duplicated UNMATCHED rows — LeftOuter nulls vanish in sum()
    def checksum(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(sum(col("v")), count(col("v")), count(lit(1))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def time(f: => Unit): Double = (1 to passes).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
    val sizes = Seq(1000000L, 4000000L, 16000000L)
    val rows = sizes.map { n =>
      val (l, r) = corpus(n)
      def plainDf = NativeAsOfJoin.asOf(l, r, "k", "t", "rt", Seq("v"),
        broadcast = Some(false))
      def buckDf = SkewAsOfJoin.asOfBucketed(l, r, "k", "t", "rt", Seq("v"),
        bucketWidth = day / 256)
      def autoDf = SkewAsOfJoin.asOfAuto(l, r, "k", "t", "rt", Seq("v"),
        allowBroadcast = false)
      // plain exec with AQE skew-splitting ARMED at thresholds matched
      // to this box's data volume (the default 256MB threshold is sized
      // for production partitions; the probe's 16M-row hot partition
      // compresses below it) — measures OptimizeSkewedGraftJoin's
      // runtime rescue of the SAME plan the `plain` column runs cold.
      def withSkewConf[T](f: => T): T = {
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        try f finally {
          spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
          spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        }
      }
      val (cp, cb, ca) = (checksum(plainDf), checksum(buckDf), checksum(autoDf))
      val cs = withSkewConf(checksum(plainDf))
      require(cp == cb && cp == ca && cp == cs,
        s"skew probe differential broke at n=$n: plain=$cp bucketed=$cb auto=$ca aqe=$cs")
      val tp = time(plainDf.count()); val tb = time(buckDf.count())
      val ta = time(autoDf.count())
      val ts = withSkewConf(time(plainDf.count()))
      System.err.println(
        f"[skew] n=$n%-9d plain=$tp%.2f aqeskew=$ts%.2f bucketed=$tb%.2f auto=$ta%.2f")
      (n, tp, ts, tb, ta)
    }
    val sb = new StringBuilder
    sb.append("\n## Skew probe — the hot-key straggler, measured\n\n")
    sb.append("Synthetic corpus: 80% of left rows on ONE key, the rest over 1024\n")
    sb.append("cold keys; right side 50k rows, same split; a (sum(v), matched\n")
    sb.append("count, row count) checksum pinned equal across all four paths\n")
    sb.append("before timing. `plain` = native\n")
    sb.append("sort-merge exec (one partition carries the hot key); `aqe-skew` =\n")
    sb.append("the SAME plan with OptimizeSkewedGraftJoin's runtime splitting\n")
    sb.append("armed at box-scale thresholds (16MB threshold / 8MB advisory —\n")
    sb.append("the 256MB default is sized for production partitions, which the\n")
    sb.append("probe's compressed hot partition stays under); `bucketed` = the\n")
    sb.append("(key x time-bucket) rewrite; `auto` = histogram-driven routing\n")
    sb.append(s"(its extra rollup pass is included in its time). Min of $passes.\n\n")
    sb.append("| left rows | plain s | aqe-skew s | bucketed s | auto s | plain/aqe | plain/bucketed |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    rows.foreach { case (n, tp, ts, tb, ta) =>
      sb.append(f"| $n%,d | $tp%.2f | $ts%.2f | $tb%.2f | $ta%.2f | ${tp / ts}%.1f× | ${tp / tb}%.1f× |\n")
    }
    sb.append("\nThe plain/bucketed ratio GROWS with size — the straggler partition\n")
    sb.append("is serial in the hot key's rows while the rewrite spreads them over\n")
    sb.append("time buckets. The `aqe-skew` column is the round-17 structural fix:\n")
    sb.append("the SAME plain plan, rescued at runtime by map-range slicing of the\n")
    sb.append("hot partition (right side duplicated per slice — never split, as-of\n")
    sb.append("picks one candidate), no rewrite needed. The bucketed/auto rewrites\n")
    sb.append("remain the answer for RIGHT-side (history) skew and for engines\n")
    sb.append("running with AQE off (SkewAsOfJoin scaladoc; same construction as\n")
    sb.append("the interval-side SkewIntervalJoin).\n")
    sb.toString
  }

  /** File-skipping probe: the manifest subsystem's I/O claim, measured
    * — files opened and wall time for a 1%-band range query over a
    * value-clustered layout and a 3-needle point lookup over the SAME
    * layout (where the needle column's per-file [min,max] bands are
    * useless and only the per-file blooms can skip), with the
    * automatic rule on vs off, at growing layout sizes. Correctness is
    * re-checked before timing: rule-on ≡ rule-off row count + sum.
    */
  private def skipProbe(spark: SparkSession, passes: Int): String = {
    import graft.sources.ManifestScan
    val tmp = System.getProperty("java.io.tmpdir")
    val nonce = java.lang.management.ManagementFactory.getRuntimeMXBean.getPid
    def time(f: => Unit): Double = (1 to passes).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
    // Dataset.inputFiles reads the ANALYZED plan (pre-optimizer) and
    // would never see the rule's pruning — count through the executed
    // scan's FileIndex instead
    def openedFiles(df: DataFrame): Int =
      df.queryExecution.executedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles.length
      }.getOrElse(sys.error("skip probe: no FileSourceScanExec in plan"))
    def check(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("id"))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val sizes = Seq(1000000L, 4000000L, 16000000L)
    val files = 64
    val rows = sizes.map { n =>
      val path = s"$tmp/graft_skip_${nonce}_$n"
      // v = multiplicative-hash of id scaled to [0, 1e6): the layout
      // clusters by v, so ids scatter uniformly across every file —
      // the exact shape where range skipping works for v and ONLY the
      // blooms work for id
      spark.range(n).select(col("id"),
          pmod(col("id") * lit(2654435761L), lit(1000000L)).as("v"))
        .repartitionByRange(files, col("v"))
        .write.mode("overwrite").parquet(path)
      ManifestScan.buildManifest(spark, path, Seq("v"), Seq("id"))
      def rangeDf = spark.read.parquet(path)
        .filter(col("v") >= 100000L && col("v") <= 110000L) // 1% band
      def pointDf = spark.read.parquet(path)
        .filter(col("id").isin(3L, n / 2, n - 3L))
      def ruleOff[T](f: => T): T = {
        spark.conf.set(graft.plans.ManifestFileSkipping.EnabledKey, "false")
        try f finally spark.conf.unset(graft.plans.ManifestFileSkipping.EnabledKey)
      }
      require(check(rangeDf) == ruleOff(check(rangeDf)) &&
        check(pointDf) == ruleOff(check(pointDf)),
        s"skip probe differential broke at n=$n")
      val (rOn, rOff) = (openedFiles(rangeDf), ruleOff(openedFiles(rangeDf)))
      val (pOn, pOff) = (openedFiles(pointDf), ruleOff(openedFiles(pointDf)))
      val trOn = time(rangeDf.count()); val trOff = ruleOff(time(rangeDf.count()))
      val tpOn = time(pointDf.count()); val tpOff = ruleOff(time(pointDf.count()))
      System.err.println(f"[skip] n=$n%-9d range $rOn/$rOff files " +
        f"$trOn%.2f/$trOff%.2f s; point $pOn/$pOff files $tpOn%.2f/$tpOff%.2f s")
      // probe layouts are single-use (PID-keyed): delete as we go so
      // repeated ScaleCurve runs don't accrete hundreds of MB in /tmp
      val fsDel = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fsDel.delete(new org.apache.hadoop.fs.Path(path), true)
      (n, rOn, rOff, trOn, trOff, pOn, pOff, tpOn, tpOff)
    }
    val sb = new StringBuilder
    sb.append("\n## File-skipping probe — manifest pruning, measured\n\n")
    sb.append(s"Synthetic layout: (id, v = hash(id) scaled to [0, 1e6)) written\n")
    sb.append(s"range-clustered by v into $files files, manifest with v min/max\n")
    sb.append("bands + per-file id blooms (AUTO-SIZED to ~10 bits per key of the\n")
    sb.append("largest file, clamped at 2^21 — a fixed-size bloom saturates at these\n")
    sb.append("per-file key counts and silently stops skipping, which is exactly\n")
    sb.append("what the first run of this probe caught). `range` = a 1% v-band\n")
    sb.append("(band skipping applies); `point` = a 3-needle id lookup — ids\n")
    sb.append("scatter uniformly over every file, so every per-file id band\n")
    sb.append("overlaps and ONLY the blooms can skip; at 16M rows the clamp\n")
    sb.append("leaves ~2.7% fpp, so a few false-positive files stay open by\n")
    sb.append("design. Counts are files OPENED (rule on/off); times are\n")
    sb.append(s"count() wall seconds, min of $passes; rule-on ≡ rule-off checksums\n")
    sb.append("pinned before timing. Absolute wins are bounded on this warm local\n")
    sb.append("box (OS page cache, no object-store latency); at 100 TB the\n")
    sb.append("skipped files are network reads that never happen.\n\n")
    sb.append("| rows | range files on/off | range s on/off | point files on/off | point s on/off |\n")
    sb.append("|---|---|---|---|---|\n")
    rows.foreach { case (n, rOn, rOff, trOn, trOff, pOn, pOff, tpOn, tpOff) =>
      sb.append(f"| $n%,d | $rOn/$rOff | $trOn%.2f/$trOff%.2f | $pOn/$pOff | $tpOn%.2f/$tpOff%.2f |\n")
    }
    sb.toString
  }

  /** Write-side upkeep probe: the manifest subsystem's WRITE-cost
    * claims, measured instead of asserted — a FIXED-size ingest batch
    * into a growing manifested table must cost ~constant wall
    * (`writeAppend`'s refresh is one directory listing plus a stats
    * pass over ONLY the new files; a versioned `append` adds one
    * metadata-scale manifest union + two renames on top), while
    * `compact` is one rewrite pass, ~linear in table size. Correctness
    * of the appends is pinned by row-count accounting before timing.
    */
  private def writeProbe(spark: SparkSession, passes: Int): String = {
    import graft.sources.{ManifestScan, VersionedTable}
    val tmp = System.getProperty("java.io.tmpdir")
    val nonce = java.lang.management.ManagementFactory.getRuntimeMXBean.getPid
    val batchRows = 200000L
    val sizes = Seq(1000000L, 4000000L, 16000000L)
    def frame(lo: Long, n: Long) = spark.range(lo, lo + n).select(col("id"),
      pmod(col("id") * lit(2654435761L), lit(1000000L)).as("v"))
    def stage(n: Long, path: String): Unit =
      frame(0, n).repartitionByRange(32, col("v"))
        .write.mode("overwrite").parquet(path)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val fsDel = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val rows = sizes.map { n =>
      // flat manifested table: writeAppend = append + manifest refresh
      val pf = s"$tmp/graft_wprobe_f_${nonce}_$n"
      stage(n, pf)
      ManifestScan.buildManifest(spark, pf, Seq("v"))
      val tApp = (1 to passes).map { i =>
        timed(ManifestScan.writeAppend(frame(n + i * batchRows, batchRows), pf,
          Seq("v"), layout = _.coalesce(2)))
      }.min
      val gotF = spark.read.parquet(pf).count()
      require(gotF == n + passes * batchRows, s"writeProbe flat accounting: $gotF")
      fsDel.delete(new org.apache.hadoop.fs.Path(pf), true)
      // versioned table: append = commit (stats pass + manifest union +
      // pointer flip); compact = snapshot rewrite + commit
      val pv = s"$tmp/graft_wprobe_v_${nonce}_$n"
      stage(n, pv)
      VersionedTable.init(spark, pv, Seq("v"))
      val tVApp = (1 to passes).map { i =>
        timed(VersionedTable.append(frame(n + i * batchRows, batchRows), pv,
          layout = _.coalesce(2)))
      }.min
      val gotV = VersionedTable.read(spark, pv).count()
      require(gotV == n + passes * batchRows, s"writeProbe versioned accounting: $gotV")
      val tComp = timed(VersionedTable.compact(spark, pv, numFiles = 8, orderBy = Some("v")))
      require(VersionedTable.read(spark, pv).count() == gotV,
        "writeProbe: compact must preserve every row")
      fsDel.delete(new org.apache.hadoop.fs.Path(pv), true)
      System.err.println(f"[write] n=$n%-9d writeAppend $tApp%.2f s; " +
        f"versioned append $tVApp%.2f s; compact $tComp%.2f s")
      (n, tApp, tVApp, tComp)
    }
    val eApp = exponent(rows.map { case (n, t, _, _) => (n.toDouble, t) })
    val eVApp = exponent(rows.map { case (n, _, t, _) => (n.toDouble, t) })
    val eComp = exponent(rows.map { case (n, _, _, t) => (n.toDouble, t) })
    val sb = new StringBuilder
    sb.append("\n## Write-side upkeep probe — manifest maintenance, measured\n\n")
    sb.append(s"Synthetic table as in the skipping probe (32 v-clustered files),\n")
    sb.append(f"grown to each size, then a FIXED ${batchRows}%,d-row batch appended\n")
    sb.append(s"(min of $passes) through (a) `ManifestScan.writeAppend` (append +\n")
    sb.append("manifest refresh in one call) and (b) `VersionedTable.append` (a\n")
    sb.append("commit: stats pass over the new files only + manifest union + CAS\n")
    sb.append("rename + pointer flip); (c) = `VersionedTable.compact` of the grown\n")
    sb.append("table to 8 files (one rewrite pass + a commit). The upkeep claim is\n")
    sb.append("that ingest cost tracks the BATCH, not the table — exponents of the\n")
    sb.append("append columns should sit near 0 (directory listing is the only\n")
    sb.append("table-sized term), while compact is the ~linear rewrite it says it\n")
    sb.append("is. Row accounting is asserted before timing.\n\n")
    sb.append("| rows | writeAppend s | versioned append s | versioned compact s |\n")
    sb.append("|---|---|---|---|\n")
    rows.foreach { case (n, a, va, c) =>
      sb.append(f"| $n%,d | $a%.2f | $va%.2f | $c%.2f |\n")
    }
    sb.append(f"\nExponents: writeAppend ${eApp}%.2f, versioned append ${eVApp}%.2f " +
      f"(claim ~0: fixed-batch upkeep), compact ${eComp}%.2f (claim ~1: rewrite pass).\n")
    sb.toString
  }

  /** Least-squares slope of log t vs log n. */
  private def exponent(points: Seq[(Double, Double)]): Double = {
    val xs = points.map(p => math.log(p._1)); val ys = points.map(p => math.log(p._2))
    val (mx, my) = (xs.sum / xs.length, ys.sum / ys.length)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val varx = xs.map(x => (x - mx) * (x - mx)).sum
    cov / varx
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE.md")
    val tmp = System.getProperty("java.io.tmpdir")
    val spark = Sessions.local(appName = "graft-scale")
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries
    // filter knob for probing one offender without paying the full
    // matrix (SCALE.md only refreshes on an unfiltered run)
    val only = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val underTest = queriesUnderTest.filter(q => only.forall(_.contains(q)))
    val skipAmp = sys.env.get("SPARK_GRAFT_SCALE_REUSE").contains("1")
    // amplification dirs live under a caller-overridable base; REUSE=1
    // implies a fixed path by design (the point is reusing a previous
    // run's replicas), but a fresh materialization gets a per-JVM nonce
    // so two concurrent ScaleCurve runs never clobber each other's
    // replicas mid-read (the same race Bucketing.runTag guards)
    val scaleBase = sys.env.get("SPARK_GRAFT_SCALE_DIR").getOrElse {
      if (skipAmp) s"$tmp/graft_scale"
      else s"$tmp/graft_scale_${java.lang.management.ManagementFactory.getRuntimeMXBean.getPid}"
    }
    // SPARK_GRAFT_SCALE_X4=1: the per-round drift tracker — run ONLY
    // the ×4 point of the same 12 queries and append one `scale_x4`
    // line to BENCH_HISTORY.jsonl, so a scaling-exponent regression
    // between rounds is visible without re-running the full matrix
    // (SCALE.md stays the committed full artifact to diff against).
    val x4Only = sys.env.get("SPARK_GRAFT_SCALE_X4").contains("1")
    val factors = if (x4Only) Seq(4) else Seq(1, 4, 16)
    val dirs: Map[Int, String] = factors.map {
      case 1 => 1 -> srcDir
      case k =>
        val d = s"${scaleBase}_x$k"
        if (!skipAmp) {
          System.err.println(s"[scale] materializing x$k under $d")
          amplify(spark, srcDir, d, k)
        }
        k -> d
    }.toMap

    // warm codegen/classloading once per query at the smallest SF
    underTest.foreach { q =>
      try qs(q)(spark, warmDir).count()
      catch { case e: Throwable => System.err.println(s"[scale-warm] $q: ${e.getMessage}") }
    }

    // diagnostic knob: override autoBroadcastJoinThreshold for a probe
    sys.env.get("SPARK_GRAFT_SCALE_BCAST").foreach { v =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
    }
    val basePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // min-of-N per (query, factor): single executions of the iterative
    // graph queries at ×16 spread 2-3× run-to-run (GC / scheduling
    // noise on a shared box); the min is the same noise filter Bench
    // uses, and the exponent fit needs stable points far more than it
    // needs average-case points
    val passes = sys.env.get("SPARK_GRAFT_SCALE_RUNS").map(_.toInt).getOrElse(2)

    if (x4Only) {
      val x4 = underTest.map { q =>
        val dt = (1 to passes).map { _ =>
          spark.sharedState.cacheManager.clearCache()
          System.gc()
          val t0 = System.nanoTime()
          qs(q)(spark, dirs(4)).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        System.err.println(f"[scale-x4] $q ${dt}%.2f s (min of $passes)")
        q -> dt
      }
      val histPath = Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", "BENCH_HISTORY.jsonl"))
      val line = s"""{"epoch_ms":${System.currentTimeMillis()},""" +
        s""""kind":"scale_x4","sf":"$srcDir","agg":"min_of_$passes",""" +
        f""""total":${x4.map(_._2).sum}%.3f,""" +
        s""""queries":{${x4.map { case (q, t) => s""""$q":${f"$t%.3f"}""" }.mkString(",")}}}""" + "\n"
      Files.writeString(histPath, line,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      println(s"SCALE_X4_DONE total=${f"${x4.map(_._2).sum}%.2f"} hist=$histPath")
      spark.stop()
      return
    }

    val rows = underTest.map { q =>
      val times = factors.map { k =>
        // partition count stays the session default at every factor:
        // probed alternatives (initial partitions × k, "constant
        // per-partition size") drowned the iterative queries in
        // task-scheduling overhead on a 32-core box (khop ×4 read
        // SLOWER than ×16) — on a real cluster the core count grows
        // with the data and absorbs the extra partitions; here the
        // fixed-width box IS the measurement device, and ×16 of sf0.1
        // stays far inside per-partition memory at width 32
        val dt = (1 to passes).map { _ =>
          spark.sharedState.cacheManager.clearCache()
          System.gc()
          val t0 = System.nanoTime()
          qs(q)(spark, dirs(k)).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        System.err.println(f"[scale] $q x$k%-2d ${dt}%.2f s (min of $passes)")
        k -> dt
      }
      val e = exponent(times.map { case (k, t) => (k.toDouble, t) })
      // the TAIL slope (×4→×16) is the scale-relevant number: the ×1
      // point sits on the job-overhead floor and drags the overall fit
      // down, which could hide superlinearity that only shows once
      // data dominates overhead
      val tail = math.log(times(2)._2 / times(1)._2) / math.log(4.0)
      (q, times, e, tail)
    }

    // NOISE GUARD: a host-load burst spanning one query's passes can
    // DOUBLE a single ×16 point (observed: the same query at 19 s and
    // 37 s minutes apart on identical replicas — min-of-N only filters
    // noise shorter than the N runs). A flag must be REPRODUCIBLE:
    // an over-threshold query gets one full re-measure per factor,
    // each point keeping the min across both rounds; only a curve that
    // is still bad flags.
    // (query, round-1 exponent/tail, round-2 fresh exponent/tail,
    // final min-based exponent/tail) — the min can only UN-flag, so
    // both rounds ride in the report to keep an intermittent
    // superlinear query visible even when the verdict clears it
    val retried =
      scala.collection.mutable.ListBuffer[(String, Double, Double, Double, Double, Double, Double)]()
    val guarded = rows.map { case r @ (q, times, e0, tail0) =>
      if (e0 <= 1.2 && tail0 <= 1.2) r
      else {
        val fresh = times.map { case (k, t) =>
          val dt = (1 to passes).map { _ =>
            spark.sharedState.cacheManager.clearCache()
            System.gc()
            val t0 = System.nanoTime()
            qs(q)(spark, dirs(k)).count()
            (System.nanoTime() - t0) / 1e9
          }.min
          System.err.println(f"[scale-retry] $q x$k%-2d min(${t}%.2f, ${dt}%.2f) s")
          (k, t, dt)
        }
        val eFresh = exponent(fresh.map { case (k, _, dt) => (k.toDouble, dt) })
        val tailFresh = math.log(fresh(2)._3 / fresh(1)._3) / math.log(4.0)
        val times2 = fresh.map { case (k, t, dt) => k -> math.min(t, dt) }
        val e2 = exponent(times2.map { case (k, t) => (k.toDouble, t) })
        val tail2 = math.log(times2(2)._2 / times2(1)._2) / math.log(4.0)
        retried += ((q, e0, tail0, eFresh, tailFresh, e2, tail2))
        (q, times2, e2, tail2)
      }
    }

    val flagged = guarded.filter(r => r._3 > 1.2 || r._4 > 1.2)
    val sb = new StringBuilder
    sb.append("# SCALE — empirical scaling curves\n\n")
    sb.append(s"Generated by `sbt \"runMain graft.ScaleCurve\"` (re-runnable; " +
      s"source sf dir: `$srcDir`).\n\n")
    sb.append("Method: the sf0.1 fixture amplified ×4 and ×16 as FK-consistent\n")
    sb.append("id-shifted replicas (documents word-salted, embeddings sign-flipped\n")
    sb.append("per replica so content-driven pair operators see NEW content, the\n")
    sb.append("way a real bigger corpus would — 16 byte-identical copies would\n")
    sb.append("measure copy multiplicity, not operator scaling). Exponent =\n")
    sb.append("least-squares slope of log t vs log n over n ∈ {1, 4, 16};\n")
    sb.append("≤ ~1.2 ≈ linear/n-log-n (the ×1 job-overhead floor biases the\n")
    sb.append("slope down, giving the threshold headroom).\n\n")
    sb.append("Excluded: MLlib fit queries (q_ml_rf/gbt/cv/tvs, q_pipeline_accidents\n")
    sb.append("— cost is the iterative fit, not a data plan) and\n")
    sb.append("q_ml_label_agreement_brute (the deliberate brute-force calibration\n")
    sb.append("oracle; its production sibling q_ml_label_agreement is the IVF scale\n")
    sb.append("path).\n\n")
    sb.append(s"Each cell is the MIN of $passes executions (single runs of the\n")
    sb.append("iterative graph queries spread 2-3x at x16 from GC/scheduling\n")
    sb.append("noise; min filters it, as in Bench). Shuffle partitions stay at\n")
    sb.append("the session default for every factor: scaling them with the data\n")
    sb.append("was probed and drowned iterative queries in task-scheduling\n")
    sb.append("overhead on this fixed 32-core box (a real cluster grows cores\n")
    sb.append("with data; here the box is the measurement device).\n\n")
    sb.append("| query | ×1 s | ×4 s | ×16 s | exponent | tail (×4→×16) | verdict |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    guarded.foreach { case (q, times, e, tail) =>
      val t = times.toMap
      val verdict = if (e <= 1.2 && tail <= 1.2) "OK" else "**FLAG**"
      sb.append(f"| $q | ${t(1)}%.2f | ${t(4)}%.2f | ${t(16)}%.2f | ${e}%.2f | ${tail}%.2f | $verdict |\n")
    }
    sb.append(f"\n${guarded.size - flagged.size}/${guarded.size} at exponent <= 1.2 " +
      f"(overall AND tail); " +
      f"flagged: ${if (flagged.isEmpty) "none" else flagged.map(_._1).mkString(", ")}\n")
    if (retried.nonEmpty) {
      sb.append("\nNoise guard: the queries below exceeded the threshold on first\n")
      sb.append("measurement and were fully re-measured (final verdict = min across\n")
      sb.append("both rounds) — a host-load burst can double a single ×16 point\n")
      sb.append("(observed 19 s vs 37 s on identical replicas). The min can only\n")
      sb.append("UN-flag, so both rounds' exponents are reported: a query whose\n")
      sb.append("round-2 FRESH curve was still over threshold is intermittent-bad,\n")
      sb.append("not noise-cleared, even if the min-based verdict reads OK.\n\n")
      sb.append("| query | round-1 exp/tail | round-2 fresh exp/tail | final (min) exp/tail |\n")
      sb.append("|---|---|---|---|\n")
      retried.foreach { case (q, e0, t0, eF, tF, e2, t2) =>
        sb.append(f"| $q | ${e0}%.2f / ${t0}%.2f | ${eF}%.2f / ${tF}%.2f | ${e2}%.2f / ${t2}%.2f |\n")
      }
    }
    if (only.isEmpty) {
      sb.append(skewProbe(spark, passes))
      sb.append(skipProbe(spark, passes))
      sb.append(writeProbe(spark, passes))
      Files.writeString(Paths.get(outPath), sb.toString)
    } else System.err.println(sb.toString)
    println(s"SCALE_DONE flagged=${flagged.size} out=$outPath")
    spark.stop()
  }
}
