package graft

import graft.operators.LengthBatching
import org.apache.spark.sql.functions._

class LengthBatchingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = (0L until 100L).map(i => (i, 1L + (i * 7) % 90))
    .toDF("doc_id", "n_tok")

  test("buckets respect the edges; batches never exceed batchSize; ids replay") {
    val a = LengthBatching.assign(docs, "doc_id", "n_tok",
      edges = Seq(10L, 30L, 60L), batchSize = 4, nShards = 4)
    val rows = a.collect()
    rows.foreach { r =>
      val (len, b) = (r.getLong(r.fieldIndex("len")), r.getInt(r.fieldIndex("bucket")))
      val want = Seq(10L, 30L, 60L).count(len >= _)
      assert(b === want, s"len $len")
      assert(r.getLong(r.fieldIndex("shard")) === r.getLong(r.fieldIndex("doc_id")) % 4)
    }
    val sizes = a.groupBy($"shard", $"bucket", $"batch").count()
      .select($"count").as[Long].collect()
    assert(sizes.forall(_ <= 4L), "no batch exceeds batchSize")
    // deterministic: re-running assigns identically
    val again = LengthBatching.assign(docs, "doc_id", "n_tok",
      edges = Seq(10L, 30L, 60L), batchSize = 4, nShards = 4)
    assert(a.exceptAll(again).isEmpty && again.exceptAll(a).isEmpty)
  }

  test("paddingStats: padded_tokens = n*max - sum, and bucketing beats one big batch") {
    val a = LengthBatching.assign(docs, "doc_id", "n_tok",
      edges = Seq(10L, 30L, 60L), batchSize = 4, nShards = 4)
    val stats = LengthBatching.paddingStats(a).collect()
    stats.foreach { r =>
      assert(r.getLong(r.fieldIndex("padded_tokens")) ===
        r.getLong(r.fieldIndex("n_seqs")) * r.getLong(r.fieldIndex("max_len")) -
          r.getLong(r.fieldIndex("sum_len")))
    }
    val bucketedPad = stats.map(r => r.getLong(r.fieldIndex("padded_tokens"))).sum
    // naive: one global batch pads everything to the corpus max
    val lens = docs.select($"n_tok").as[Long].collect()
    val naivePad = lens.length * lens.max - lens.sum
    assert(bucketedPad < naivePad,
      s"bucketed $bucketedPad must beat naive $naivePad")
  }

  test("invalid edges fail fast") {
    intercept[IllegalArgumentException] {
      LengthBatching.bucketOf(lit(1L), Seq(30L, 10L))
    }
  }
}
