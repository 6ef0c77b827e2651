package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication at corpus scale: exact, fingerprint, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Design notes for 100 TB:
  *  - exact/fingerprint dedup is a hash-groupBy — one shuffle on a short
  *    hash key, map-side combined.
  *  - pairwise methods NEVER do an all-pairs join: candidates come from an
  *    equi-join on a bucket key (LSH band hash / SimHash prefix), so cost
  *    is Σ bucket² over near-constant-size buckets, not n².
  *  - exact Jaccard is offered for verification of candidates, joined on
  *    shared shingles with document-frequency capping to bound skew.
  */
object Dedup {

  /** Exact duplicates: one row per md5(text) cluster with size > 1. */
  def exactClusters(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol).cast("binary")).as("text_md5"))
      .agg(count(lit(1)).as("cluster_size"), min(col(idCol)).as("keep_id"))
      .filter(col("cluster_size") > 1)

  /** Keep one representative row per exact-duplicate cluster (min id). */
  def dropExactDuplicates(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol).cast("binary"))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Fingerprint (sorted-token-set) duplicate clusters. */
  def fingerprintClusters(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .groupBy(tokenSetFingerprint(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("cluster_size"), min(col(idCol)).as("keep_id"),
        min(length(col(textCol))).as("min_chars"), max(length(col(textCol))).as("max_chars"))
      .filter(col("cluster_size") > 1)

  /** Exact word-n-gram Jaccard over candidate pairs that share ≥1 shingle.
    *
    * `maxShingleDf` drops shingles appearing in more documents than the
    * cap before the pair-generating self-join — the standard
    * skew-bounding trick (a shingle in d docs generates d² pairs; common
    * boilerplate would otherwise dominate). Pairs whose true Jaccard ≥
    * `threshold` are returned with both sizes and the intersection count.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      maxShingleDf: Int = 1000): DataFrame =
    shingleIntersections(docs, n, idCol, textCol, maxShingleDf)
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")

  /** Containment near-dup pairs: |A∩B| / min(|A|, |B|) ≥ `threshold` —
    * catches a SMALL document embedded in a big one (quotation,
    * boilerplate inclusion, article + wrapper page), where symmetric
    * Jaccard stays low because the union is dominated by the big side.
    * Same candidate machinery (and cost bound) as [[ngramJaccardPairs]].
    */
  def containmentPairs(docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      maxShingleDf: Int = 1000): DataFrame =
    shingleIntersections(docs, n, idCol, textCol, maxShingleDf)
      .withColumn("containment",
        col("n_common").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "containment")

  /** Shared candidate stage of the exact pair scorers: distinct-shingle
    * intersection counts + both set sizes for every pair sharing ≥1
    * (df-capped) shingle.
    */
  private def shingleIntersections(docs: DataFrame, n: Int,
      idCol: String, textCol: String, maxShingleDf: Int): DataFrame = {
    // persist: the exploded shingle set feeds FOUR consumers (df cap,
    // both self-join sides, per-doc sizes) — without it the tokenize +
    // shingle + explode pipeline re-runs per consumer (C3; the round-1
    // plan recomputed it 4×). Tokens are projected to a column BEFORE
    // shingling so the regex split runs once per doc, not per shingle.
    // fan the doc scan out before tokenizing: the regex split + shingle
    // explosion is the cache-fill job's whole cost and would otherwise
    // run fused onto a one-task scan (guide §2.5)
    // n_sh (the doc's distinct-shingle count) rides ON the shingle rows
    // (round 21): a window over the fan-out's own doc_id partitioning —
    // no exchange, one sort inside the cache-fill job — so the pair
    // aggregation below reads both set sizes from its own input rows.
    // The round-20 shape joined a separate per-doc size aggregate onto
    // the PAIR table twice; at scale those are two re-shuffles of the
    // largest frame in the query (pair keys ≈ Σdf² ≫ docs) — guide §2.3
    // "shuffle metadata with the rows, not payload re-joins".
    val sh = ScanFanout.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), explode(array_distinct(shinglesFromTokens(col("_toks"), n))).as("shingle"))
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      // persist PARTITIONED BY THE JOIN KEY (round 21, guide §2.4): the
      // size window rides the fan-out's doc_id clustering, then one
      // shingle exchange at fill time replaces the two the pair
      // self-join paid per scan — and the df-cap aggregation below now
      // reads its groupBy key pre-clustered (no exchange at all)
      .repartition(col("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Document-frequency cap WITHOUT a window: a window over
    // partitionBy(shingle) shuffles the whole exploded shingle set with no
    // partial aggregation. Instead aggregate df per shingle (map-side
    // combined), keep only the over-cap shingles (a tiny set by
    // construction — boilerplate), and broadcast-anti-join them away.
    val overCap = sh.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxShingleDf)
      .select(col("shingle"))
    val capped = sh.join(broadcast(overCap), Seq("shingle"), "left_anti")
    // shuffle_hash: sort-merge would order-sort the exploded shingle
    // STRINGS on both sides; a hash join probes without sorting, and the
    // df cap has already bounded per-key skew.
    // max(n_sh) per pair side is exact: every row of a pair group
    // carries that side's single UNCAPPED size (the window ran before
    // the df cap dropped any row).
    capped.as("a").hint("shuffle_hash")
      .join(capped.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"),
        max(col("a.n_sh")).as("n_a"), max(col("b.n_sh")).as("n_b"))
  }

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * Signature of `bands*rowsPerBand` minhashes per doc; docs colliding on
    * any band's hash become candidates; candidates are scored by the
    * estimated Jaccard (fraction of equal signature components) and kept
    * at ≥ `estThreshold`. No all-pairs stage: the join key is
    * (band index, band hash).
    */
  def minHashLshPairs(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
      estThreshold: Double, idCol: String = "doc_id", textCol: String = "text",
      maxBucketSize: Int = 1000, seed: Long = 42L,
      oracleHashes: Boolean = false): DataFrame = {
    val k = bands * rowsPerBand
    val banded = minHashBanded(docs, n, bands, rowsPerBand, idCol, textCol, seed, oracleHashes)
      // persist: consumed by the bucket-size cap and both join sides —
      // the k-way minhash aggregation upstream is the expensive part.
      // Partitioned by the bucket key (round 21, guide §2.4): the cap
      // aggregation and both pair-join scans then reuse the cache's own
      // clustering instead of three (band, bhash) exchanges
      .repartition(col("band"), col("bhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // cap pathological buckets (all-identical boilerplate) to bound skew —
    // aggregated bucket sizes + broadcast anti-join, NOT a window (same
    // no-partial-agg reasoning as the shingle df cap above)
    val bucketed = banded.join(
      broadcast(overCapBuckets(banded, maxBucketSize)), Seq("band", "bhash"), "left_anti")

    val pairs = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")

    pairs
      .withColumn("est_jaccard", estJaccard(k))
      .filter(col("est_jaccard") >= estThreshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Banded MinHash signature table: `(doc_id, sig, band, bhash)` — one
    * row per (document, band). This is the STORABLE index of the LSH
    * pipeline: at corpus scale it is written once (partitioned or
    * bucketed by `(band, bhash)`) and reused by every subsequent
    * [[minHashLshPairs]]-style self-join or [[deltaMinHashPairs]] probe,
    * so ingesting new data never re-reads or re-hashes historical text.
    */
  def minHashBanded(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
      idCol: String = "doc_id", textCol: String = "text", seed: Long = 42L,
      oracleHashes: Boolean = false): DataFrame = {
    val k = bands * rowsPerBand
    // Relational minhash: explode shingles once, hash each shingle k ways
    // in a codegen'd projection, take k map-side-combined min aggregates.
    // (The array-lambda formulation — min over transform(...) per
    // component — runs interpreted and re-evaluates the shingle pipeline
    // per consumer: ~30× slower at sf0.1.) Docs with fewer than n tokens
    // have no shingles and drop out, matching the old size-filter.
    //
    // Kirsch–Mitzenmacher construction ("Less Hashing, Same Performance"):
    // component_i = (h1 + i·h2) mod p with p = 2^31-1 — TWO base hashes
    // per shingle instead of k full hashes (round 5 paid 32 md5s per
    // shingle in the gate family, tripling the bench query), preserving
    // the minhash property. h2 is reduced mod p before the multiply so
    // i·h2 stays far from Long overflow (ANSI-safe).
    //
    // Two hash families feed the SAME pipeline (banding, bucket cap,
    // candidate join, signature scoring are shared code):
    //  - xxhash64 (default): cheapest per byte, the production family.
    //  - oracleHashes: h1/h2 = two disjoint 60-bit slices of md5(shingle)
    //    — every step is plain ANSI SQL, so an external engine (the
    //    DuckDB correctness oracle) can replay the ENTIRE LSH pipeline
    //    and hash-check it end to end, not just count rows.
    val P = 2147483647L
    // fan out before tokenize/shingle/k-way minhash partial aggregation
    // — all fused onto the scan task otherwise (guide §2.5)
    val sh0 = ScanFanout.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"),
        explode(array_distinct(shinglesFromTokens(col("_toks"), n))).as("shingle"))
    val sh =
      if (oracleHashes) {
        val m = md5(col("shingle").cast("binary"))
        sh0.select(col("doc_id"),
          (conv(substring(m, 1, 15), 16, 10).cast("long") % P).as("_h1"),
          (conv(substring(m, 16, 15), 16, 10).cast("long") % P).as("_h2"))
      } else
        sh0.select(col("doc_id"),
          pmod(xxhash64(col("shingle"), lit(seed)), lit(P)).as("_h1"),
          pmod(xxhash64(col("shingle"), lit(seed + 1)), lit(P)).as("_h2"))
    val mins = (0 until k).map(i =>
      min((col("_h1") + lit(i.toLong) * col("_h2")) % P).as(s"_m$i"))
    val sigs = sh.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"_m$i")): _*).as("sig"))

    val bandKey: Column => Column =
      if (oracleHashes) s => md5(s.cast("binary")) else s => xxhash64(s)
    sigs.select(
      col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          bandKey(concat_ws(",",
            transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
              x => x.cast("string"))))
            .as("bhash")))).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bhash").as("bhash"))
  }

  /** Incremental corpus dedup: near-dup matches of a NEW document batch
    * against an already-signed corpus index — the daily-ingest shape at
    * 100 TB. The historical corpus is hashed ONCE into a stored
    * [[minHashBanded]] table; each arriving batch is signed (cost ∝
    * batch size) and probed with a `(band, bhash)` equi-join (cost ∝
    * colliding buckets), never re-reading corpus text. Ids must be
    * disjoint across the two inputs. Pathological index buckets
    * (boilerplate floods) are dropped by aggregated size + broadcast
    * anti-join from BOTH sides — removing them from the delta too is a
    * pure optimization (their index rows are gone, so those delta rows
    * could never pair). The delta side is typically orders of magnitude
    * smaller than the index; Spark broadcasts it when its stats allow.
    *
    * @param indexBanded a [[minHashBanded]] table for the corpus (read
    *                    from storage in production)
    * @return (new_id, dup_of, est_jaccard) — delta docs estimated ≥
    *         `estThreshold` Jaccard-similar to an indexed doc
    */
  def deltaMinHashPairs(indexBanded: DataFrame, deltaDocs: DataFrame, n: Int,
      bands: Int, rowsPerBand: Int, estThreshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      maxBucketSize: Int = 1000, seed: Long = 42L,
      oracleHashes: Boolean = false): DataFrame = {
    val k = bands * rowsPerBand
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // persist: the index feeds the bucket-size cap and the probe join
    val idx = indexBanded.persist(lvl)
    val overCap = broadcast(overCapBuckets(idx, maxBucketSize))
    val idxKept = idx.join(overCap, Seq("band", "bhash"), "left_anti")
    val delta = minHashBanded(deltaDocs, n, bands, rowsPerBand, idCol, textCol,
        seed, oracleHashes)
      .join(overCap, Seq("band", "bhash"), "left_anti")
    delta.as("d")
      .join(idxKept.as("x"),
        col("d.band") === col("x.band") && col("d.bhash") === col("x.bhash"))
      .select(col("d.doc_id").as("new_id"), col("x.doc_id").as("dup_of"),
        col("d.sig").as("sig_a"), col("x.sig").as("sig_b"))
      .dropDuplicates("new_id", "dup_of")
      .withColumn("est_jaccard", estJaccard(k))
      .filter(col("est_jaccard") >= estThreshold)
      .select("new_id", "dup_of", "est_jaccard")
  }

  /** Buckets larger than `maxBucketSize` in a banded signature table. */
  private def overCapBuckets(banded: DataFrame, maxBucketSize: Int): DataFrame =
    banded.groupBy(col("band"), col("bhash"))
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") > maxBucketSize)
      .select(col("band"), col("bhash"))

  /** Estimated Jaccard = fraction of equal components of sig_a/sig_b. */
  private def estJaccard(k: Int): Column =
    size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
      .cast("double") / k

  /** SimHash near-duplicate pairs: 64-bit fingerprints compared within
    * LSH blocks. By pigeonhole, two fingerprints within hamming distance
    * h must agree exactly on at least one of h+1 disjoint bit blocks, so
    * the block count is DERIVED from `maxHamming` — candidate generation
    * is complete (no silent recall loss) for any requested radius. Note
    * the block key narrows as maxHamming grows (64/(h+1) bits), so large
    * radii cost proportionally more candidates; typical near-dup use is
    * h ≤ 3 (4 blocks × 16 bits).
    */
  def simHashPairs(docs: DataFrame, maxHamming: Int,
      idCol: String = "doc_id", textCol: String = "text",
      oracleHashes: Boolean = false): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming=$maxHamming out of [0, 64)")
    val chunks = maxHamming + 1 // pigeonhole: exact for hamming <= maxHamming
    // Relational simhash (same reasoning as minHashLshPairs): explode the
    // token multiset, hash once per token, then one conditional-sum
    // aggregate per bit — all inside whole-stage codegen with map-side
    // combine. Hash families (shared pipeline, same reasoning as
    // minHashLshPairs.oracleHashes):
    //  - xxhash64, 64 bits (default): the production family.
    //  - oracleHashes: the top 15 hex chars of md5(token) parsed as a
    //    60-bit non-negative long — ANSI-SQL-replayable (and an external
    //    brute-force all-pairs oracle then also PROVES the pigeonhole
    //    blocking loses no pair at the requested radius).
    val nBits = if (oracleHashes) 60 else 64
    // fan out before tokenize + per-token hashing (guide §2.5)
    val toks = ScanFanout.byKey(docs, col(idCol)).select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val h =
      if (oracleHashes)
        conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10).cast("long")
      else xxhash64(col("tok"))
    val bitSums = (0 until nBits).map { i =>
      sum(when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"_b$i")
    }
    val fp = toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until nBits).map(i => when(col(s"_b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
    hammingPairs(fp, nBits, maxHamming)
  }

  /** All pairs of fingerprints within `maxHamming` bits, candidates via
    * pigeonhole LSH blocks (two fingerprints within hamming h agree on
    * one of h+1 disjoint bit blocks — candidate generation is COMPLETE
    * at the requested radius). Shared by the text SimHash path and the
    * multimodal perceptual-hash path.
    */
  def hammingPairs(fps: DataFrame, nBits: Int, maxHamming: Int,
      idCol: String = "doc_id", fpCol: String = "fp"): DataFrame = {
    require(maxHamming >= 0 && maxHamming < nBits, s"maxHamming=$maxHamming out of [0, $nBits)")
    val chunks = maxHamming + 1 // pigeonhole: exact for hamming <= maxHamming
    // distribute the bits over `chunks` near-equal disjoint blocks
    val widths = (0 until chunks).map(i => nBits / chunks + (if (i < nBits % chunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val blocked = fps.select(col(idCol).as("doc_id"), col(fpCol).as("fp"))
      .select(col("doc_id"), col("fp"),
        explode(array((0 until chunks).map { i =>
          val mask = if (widths(i) >= 64) -1L else (1L << widths(i)) - 1L
          struct(lit(i).as("blk"),
            shiftright(col("fp"), offsets(i)).bitwiseAND(mask).as("bkey"))
        }: _*)).as("b"))
      .select(col("doc_id"), col("fp"), col("b.blk").as("blk"), col("b.bkey").as("bkey"))
      // persist: both self-join sides — the upstream fingerprint
      // computation (64 conditional sums / a media decode pass) is the
      // expensive part. NOT repartitioned by the block key: the round-21
      // A/B regressed it (simhash 0.93 → 1.36 s) — the block frame is
      // small enough that AQE broadcast-joins the pair join, so a forced
      // exchange buys clustering nothing uses
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming64(col("a.fp"), col("b.fp")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-duplicate pair list — the closure
    * step of corpus dedup: A≈B and B≈C put {A,B,C} in one cluster even
    * when A≈C was never emitted, and the keeper is the component's min
    * id. Iterative min-label propagation: each round joins the
    * symmetrized edge list with the current labels and takes the min
    * over each vertex's neighborhood (map-side-combined `min`, one
    * shuffle per round), converging in O(cluster diameter) rounds —
    * near-dup clusters are shallow (boilerplate families, mirror
    * copies), so this beats the O(log²) star-contraction variants that
    * pay 2-3 joins per round. Convergence is detected from Σcomp, which
    * strictly decreases until fixpoint — one scalar action per round,
    * no extra change-count join. The driver loop is over ITERATIONS
    * (bounded by `maxIters`), never over rows.
    */
  /** @param checkpointDir when set, lineage truncation uses RELIABLE
    *   `checkpoint()` into this (shared-FS) directory, so an executor
    *   loss mid-convergence recovers from the checkpoint instead of
    *   failing the job — the production mode at 100 TB. When None,
    *   `localCheckpoint` (executor blocks, no FS round trip) keeps the
    *   single-node fast path. Identical labeling either way.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIters: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sc = pairs.sparkSession.sparkContext
    // A session-level checkpoint dir (spark.checkpoint.dir / an earlier
    // setCheckpointDir) opts the whole session into reliable mode: use it
    // even when the caller didn't pass one explicitly.
    val effectiveCkpt = checkpointDir.orElse(sc.getCheckpointDir)
    // setCheckpointDir is SparkContext-GLOBAL: remember the prior value
    // and restore it on exit so this call can't silently redirect other
    // code's checkpoints for the rest of the session.
    val priorCkpt = sc.getCheckpointDir
    checkpointDir.foreach(sc.setCheckpointDir)
    // symmetrize in ONE scan of `pairs` (explode to both directions):
    // a two-branch union would evaluate the upstream pair-generation
    // pipeline — typically an expensive LSH/Jaccard subtree — twice
    val edges0 = pairs
      .select(col(idA).cast("long").as("a"), col(idB).cast("long").as("b"))
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(lvl)
    // Iteration width sized to the EDGE COUNT (~500k edges/partition,
    // min 1): the loop below runs O(diameter) sequential rounds, and a
    // session-width (32+) cached edge list makes every round pay a full
    // task wave per stage even when the near-dup graph is tiny relative
    // to the corpus (dup pairs are a sliver of 100 TB). The count() also
    // materializes the persist the first round needs anyway. Coalesce is
    // narrow — no extra shuffle.
    val iterParts = math.max(1L, math.min(edges0.count() / 500000L, 4096L)).toInt
    val edges = edges0.coalesce(iterParts)
    // Storage discipline (round 11): a persisted frame must NEVER be
    // unpersisted while a LATER CacheManager entry depends on it —
    // non-cascading invalidation drops the dependent's data and lazily
    // re-caches, so each iteration would silently recompute its
    // predecessors back to the last checkpoint. Local mode therefore
    // eager-localCheckpoints EVERY iteration (RDD blocks, no
    // CacheManager, lineage truncated each round; superseded blocks are
    // reclaimed by the ContextCleaner). Reliable mode keeps per-round
    // persists but defers ALL releases to the next reliable checkpoint,
    // the one point where nothing live depends on them.
    val reliableMode = effectiveCkpt.isDefined
    val pending = scala.collection.mutable.Buffer[DataFrame]()
    val labels0 = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
    var labels =
      if (reliableMode) { val p = labels0.persist(lvl); pending += p; p }
      else labels0.localCheckpoint(true)
    // coalesce: sum over ZERO rows is null — an empty pair list (clean
    // corpus) must return an empty labeling, not NPE on head.getLong
    def sigOf(df: DataFrame): Long =
      df.agg(coalesce(sum(col("comp")), lit(0L))).head.getLong(0)
    // emptiness + signature in ONE action (row count never changes after
    // initialization, so later rounds need only the signature)
    val head0 = labels.agg(coalesce(sum(col("comp")), lit(0L)), count(lit(1))).head
    var sig = head0.getLong(0)
    var converged = head0.getLong(1) == 0L // no vertices ⇒ already at fixpoint
    var it = 0
    while (!converged && it < maxIters) {
      val viaNbr = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("nbr_comp")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nbr_comp")).as("nbr_comp"))
      val computed = labels.join(viaNbr, Seq("id"), "left_outer")
        .select(col("id"), least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      it += 1
      // Reliable mode: persist per round; every 5th round writes a
      // RELIABLE checkpoint (recomputable after executor loss — the
      // production mode) whose LogicalRDD no longer references any
      // cache, making that the safe point to release every deferred
      // persist. Local mode already checkpointed `computed` eagerly.
      val next =
        if (!reliableMode) computed.localCheckpoint(true)
        else if (it % 5 == 0) {
          val cached = computed.persist(lvl)
          val cp = cached.checkpoint(eager = true)
          cached.unpersist()
          pending.foreach(_.unpersist()); pending.clear()
          cp
        } else { val cached = computed.persist(lvl); pending += cached; cached }
      val nsig = sigOf(next)
      converged = nsig == sig
      sig = nsig
      labels = next
    }
    // reliable-mode tail: the last rounds since the final checkpoint are
    // still persisted with live dependents — checkpoint once more so
    // every cache (and edges0 below) can release safely
    if (reliableMode && pending.nonEmpty) {
      val cp = labels.checkpoint(eager = true)
      pending.foreach(_.unpersist()); pending.clear()
      labels = cp
    }
    if (!converged) log.warn(
      s"connectedComponents: maxIters=$maxIters reached before fixpoint — " +
        "components with diameter > maxIters are split; returned labeling is partial")
    edges0.unpersist() // the persisted plan is the pre-coalesce one
    // restore the caller's checkpoint dir (there is no public "unset", so
    // a previously-unset dir stays at whatever this call set — harmless,
    // but a previously-SET dir must come back)
    if (checkpointDir.isDefined) priorCkpt.foreach(sc.setCheckpointDir)
    labels.select(col("id").as("doc_id"), col("comp").as("component"))
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Leakage-safe train/test split: documents are assigned by the HASH OF
    * THEIR NEAR-DUP GROUP (connected component of `pairs`; singletons are
    * their own group), so two near-duplicates can never straddle the
    * split — the standard guard against eval contamination when a corpus
    * carries duplicate clusters. The group hash is the same replayable
    * integer family as [[MixtureSampler]] (Knuth multiplicative mod
    * 1e9+7), so the split is deterministic across engines and re-runs —
    * a requirement for a split that must stay stable while the corpus is
    * re-processed.
    *
    * Output: docs' id column + (grp long, split string('train'|'test')).
    *
    * @param checkpointDir forwarded to [[connectedComponents]]: at 100 TB
    *   the split job is exactly the long-running job that loses an
    *   executor mid-flight, so production callers pass a shared-FS dir
    *   (or set a session checkpoint dir, which is picked up
    *   automatically) to get RELIABLE checkpoints; None on a session
    *   with no checkpoint dir keeps the single-node localCheckpoint
    *   fast path. The labeling — and therefore the split — is identical
    *   either way.
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, testFrac: Double = 0.1,
      idCol: String = "doc_id", checkpointDir: Option[String] = None): DataFrame = {
    val comps = connectedComponents(pairs, checkpointDir = checkpointDir)
    val cut = (testFrac * 1000000007L).toLong
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(comps, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("grp"))
      .withColumn("split",
        when(((col("grp") + 42) % 1000000007L) * 2654435761L % 1000000007L < cut, lit("test"))
          .otherwise(lit("train")))
  }

  /** X60 semantic near-duplicates (SemDeDup-style: cluster the
    * embedding space, then compare ONLY within a cluster): candidate
    * pairs come from an equality join on the cluster id, never from
    * all-pairs — the embedding-space complement of the lexical
    * inverted-index pairing in [[SparseSimilarity]], and the
    * literature-standard corpus-level semantic dedup.
    *
    * `centroids` is any (cent_id, cent_v, cent_n) table: the production
    * fit is [[SimilaritySearch.kmeansCentroids]] (MLlib KMeans,
    * deterministic under seed); [[SimilaritySearch.modularCentroids]]
    * is the oracle-expressible stand-in at identical plan shape. The
    * assignment reuses the IVF build (broadcast centroids + map-side
    * max_by — vectors shuffle ONCE into their cluster), so cost is
    * Σ|cluster|²/2 instead of n²/2; at 100 TB size k so n/k bounds the
    * per-cluster self-join, exactly like an IVF list.
    */
  /** @param nAssign soft-assignment width: with 1 (the SemDeDup
    *   default) each vector lives in exactly its nearest cluster and
    *   the assignment is the map-side max_by of the IVF build; with
    *   n > 1 a vector joins its n nearest clusters, so a pair straddling
    *   a cluster boundary is still caught when ANY cluster is shared —
    *   recall rises at ~n² candidate cost, the same dial as IVF nProbe.
    */
  def semanticNearDupPairs(emb: DataFrame, centroids: DataFrame, cosThreshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nAssign: Int = 1): DataFrame = {
    require(nAssign >= 1, s"nAssign=$nAssign must be >= 1")
    def scoreOf(va: Column, vb: Column, na: Column, nb: Column): Column =
      when(na * nb === 0.0, lit(0.0))
        .otherwise(VectorFunctions.dot(va, vb) / (na * nb))
    if (nAssign == 1) {
      // hard assignment: the index rows already carry vector + norm, so
      // the intra-cluster self-join needs no join-back
      val idx = SimilaritySearch.buildIvfIndex(centroids, emb, idCol, vecCol)
      val a = idx.select(col("cent_id"), col(idCol).as("id_a"),
        col("_cv").as("va"), col("_cn").as("na"))
      val b = idx.select(col("cent_id"), col(idCol).as("id_b"),
        col("_cv").as("vb"), col("_cn").as("nb"))
      a.join(b, Seq("cent_id"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cosine", scoreOf(col("va"), col("vb"), col("na"), col("nb")))
        .filter(col("cosine") >= cosThreshold)
        .select(col("id_a"), col("id_b"), col("cosine"))
    } else {
      // soft assignment: candidate rows carry ONLY (cent_id, id) through
      // the self-join + pair dedup (a pair sharing 2 clusters arrives
      // twice); vectors join back AFTER dedup — the same
      // never-shuffle-vectors-through-pairs discipline as
      // [[embeddingNearDupPairs]]
      val vecs = ScanFanout.byKey(emb, col(idCol)).select(col(idCol).as("vec_id"),
        VectorFunctions.toDoubleArray(col(vecCol)).as("v"))
        .withColumn("n", VectorFunctions.norm(col("v")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val assigned = TopK.perGroup(
          vecs.crossJoin(broadcast(centroids))
            .withColumn("_sim", scoreOf(col("v"), col("cent_v"), col("n"), col("cent_n"))),
          partitionBy = Seq(col("vec_id")),
          orderBy = Seq(col("_sim").desc, col("cent_id")), k = nAssign)
        .select(col("cent_id"), col("vec_id"))
      val cand = assigned.as("a")
        .join(assigned.as("b"),
          col("a.cent_id") === col("b.cent_id") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      cand
        .join(vecs.select(col("vec_id").as("id_a"), col("v").as("va"), col("n").as("na")), "id_a")
        .join(vecs.select(col("vec_id").as("id_b"), col("v").as("vb"), col("n").as("nb")), "id_b")
        .withColumn("cosine", scoreOf(col("va"), col("vb"), col("na"), col("nb")))
        .filter(col("cosine") >= cosThreshold)
        .select(col("id_a"), col("id_b"), col("cosine"))
    }
  }

  /** Embedding near-duplicates: pairs with cosine ≥ threshold, candidates
    * from MULTI-TABLE random-hyperplane LSH — `nTables` independent
    * nBits-bit hash tables; a pair is a candidate when it collides in
    * ANY table (union via the (table, bucket) equi-join + pair dedup).
    *
    * Recall per pair at angle θ is 1-(1-(1-θ/π)^nBits)^nTables — the
    * round-1 single-table version measured 8% recall at cos ≥ 0.2; the
    * 8×4-bit default measures ~0.7+ at cos ≥ 0.35 (DedupSpec asserts
    * the floor). Cost scales as nTables × n² / 2^nBits per bucket-join,
    * still never all-pairs.
    */
  def embeddingNearDupPairs(emb: DataFrame, dim: Int, cosThreshold: Double,
      nBits: Int = 4, nTables: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    // norms precomputed per vector: the pair-scoring cosine then costs
    // ONE dot product instead of three array aggregates per candidate.
    // The scan is fanned out first (guide §2.5): the nTables×nBits×dim
    // hyperplane hashing downstream reads this cache and would otherwise
    // inherit the one-task layout of a single-row-group parquet scan.
    val vecs = ScanFanout.byKey(emb, col(idCol)).select(col(idCol).as("vec_id"),
      VectorFunctions.toDoubleArray(col(vecCol)).as("v"))
      .withColumn("n", VectorFunctions.norm(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bucket rows carry ONLY (id, table, bucket) — the candidate
    // self-join and pair dedup shuffle 16-byte rows, never the vectors
    // (carrying the embeddings through dropDuplicates shuffled ~1 KB/row
    // and dominated the whole query)
    // (round-21 A/B: persisting these bucket rows keyed by (tbl, bucket)
    // regressed q_embed_neardup 0.99 → 1.46 s — the rows are 16 bytes,
    // recomputing them from the vector cache is cheaper than the forced
    // exchange, and AQE broadcast-joins the pair join anyway)
    val hashed = vecs.select(col("vec_id"),
      explode(array((0 until nTables).map { t =>
        struct(lit(t).as("tbl"),
          VectorFunctions.hyperplaneSimHash(col("v"), nBits, dim,
            seed = seed + 7919L * t).as("bucket"))
      }: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val cand = hashed.as("a")
      .join(hashed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // vectors join back AFTER dedup: pairs << corpus × nTables
    cand
      .join(vecs.select(col("vec_id").as("id_a"), col("v").as("va"), col("n").as("na")), "id_a")
      .join(vecs.select(col("vec_id").as("id_b"), col("v").as("vb"), col("n").as("nb")), "id_b")
      .withColumn("cosine",
        when(col("na") * col("nb") === 0.0, lit(0.0))
          .otherwise(VectorFunctions.dot(col("va"), col("vb")) / (col("na") * col("nb"))))
      .filter(col("cosine") >= cosThreshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
