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
}
