package graft

import graft.operators.IncrementalDedup
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private val path =
    s"${System.getProperty("java.io.tmpdir")}/graft_fpidx_spec"

  test("probe finds exactly the batch docs whose content exists in the index") {
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "gamma beta alpha"))
      .toDF("doc_id", "text") // 1 and 3 are the same token SET
    IncrementalDedup.writeIndex(corpus, path)
    val batch = Seq(
      (100L, "beta alpha gamma gamma"), // same token set as cluster {1, 3}
      (101L, "epsilon delta"),          // same set as doc 2
      (102L, "totally novel content"))
      .toDF("doc_id", "text")
    val got = IncrementalDedup.probe(spark, batch, path)
      .select($"doc_id", $"dup_of").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet === Set((100L, 1L), (101L, 2L)),
      "dup_of is the cluster's canonical (min) id; novel docs are absent")
  }

  test("index layout: fingerprints only, prefix-partitioned, pruned on selective probes") {
    val corpus = Tables.load(spark, TestSpark.sf0001, "documents")
    IncrementalDedup.writeIndex(corpus, path)
    val index = spark.read.parquet(path)
    assert(index.columns.sorted === Array("dup_of", "fingerprint", "fp_prefix"),
      "no text column ever lands in the index")
    // a selective probe (single prefix) must partition-prune the scan
    val pruned = index.filter($"fp_prefix" === "a")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("fp_prefix"),
      "prefix filter must reach PartitionFilters:\n" + scan)
    val allPrefixes = index.select($"fp_prefix").distinct().count()
    assert(allPrefixes >= 10, s"hex prefixes spread the layout ($allPrefixes seen)")
  }

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft_fpidx_spec_").resolve("idx").toString

  private def indexContentHash(path: String): Seq[(String, Long)] =
    spark.read.parquet(path)
      .select($"fingerprint", $"dup_of").orderBy($"fingerprint")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("refreshIndex admits only novel fingerprints and is idempotent (run-twice == run-once)") {
    val p = freshPath()
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    IncrementalDedup.writeIndex(corpus, p)
    val batch = Seq(
      (100L, "beta alpha gamma"),        // duplicate of cluster {1, 3} — must NOT be admitted
      (102L, "totally novel content"),   // novel — admitted with dup_of = 102
      (103L, "novel content totally"))   // same set as 102 — one cluster, dup_of = min = 102
      .toDF("doc_id", "text")
    IncrementalDedup.refreshIndex(spark, batch, p)
    val once = indexContentHash(p)
    assert(once.map(_._2).toSet === Set(1L, 2L, 102L),
      "existing clusters keep their canonical id; the novel cluster gets the batch min")
    assert(once.length === 3, "one row per distinct fingerprint, no duplicate for {1,3}'s set")
    IncrementalDedup.refreshIndex(spark, batch, p) // second refresh: everything now exists
    assert(indexContentHash(p) === once,
      "refresh is idempotent — re-running the same batch appends nothing")
    // the admitted fingerprint must now gate future probes
    val probe2 = IncrementalDedup.probe(spark,
      Seq((200L, "content novel totally")).toDF("doc_id", "text"), p)
      .select($"doc_id", $"dup_of").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(probe2.toSet === Set((200L, 102L)))
  }

  test("partition pruning survives repeated appends") {
    val p = freshPath()
    IncrementalDedup.writeIndex(
      Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text"), p)
    (0 until 4).foreach { i =>
      IncrementalDedup.refreshIndex(spark,
        Seq((10L + i, s"fresh words number $i")).toDF("doc_id", "text"), p)
    }
    val index = spark.read.parquet(path = p)
    assert(index.count() === 6L)
    // filter on a prefix value that exists, typed as the reader inferred
    // it (a tiny all-digit partition set infers numeric)
    val pfx = index.select($"fp_prefix").first().get(0)
    val scan = index.filter($"fp_prefix" === pfx).queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("fp_prefix"),
      "prefix filter must still reach PartitionFilters after appends:\n" + scan)
  }
}
