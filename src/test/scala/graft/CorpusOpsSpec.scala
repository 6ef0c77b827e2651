package graft

import graft.ml.RandomUnderSampler
import graft.operators.{Contamination, MixtureSampler, RepetitionScore}
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {

  test("full / partial / zero overlap on a hand-built fixture") {
    val s = spark; import s.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // identical → contamination 1.0
      (2L, "alpha beta gamma zeta eta"),      // shares exactly one 3-gram
      (3L, "one two three four five")         // disjoint → 0.0
    ).toDF("doc_id", "text")
    val r = Contamination.ngramOverlap(corpus, bench, n = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Double]("contamination") == 1.0)
    assert(r(2L).getAs[Long]("n_contaminated") == 1L && r(2L).getAs[Long]("n_shingles") == 3L)
    assert(r(3L).getAs[Long]("n_contaminated") == 0L)
  }

  test("benchmark side broadcasts — corpus shingles never shuffle to a sort-merge") {
    val s = spark; import s.implicits._
    val bench = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val p = Contamination.ngramOverlap(corpus, bench, n = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "benchmark set must broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"), "corpus side must not sort-merge:\n" + p)
  }
}

class MixtureSamplerSpec extends SparkSpec {

  test("alpha=0.5 keeps the smallest source whole, downsamples the rest by sqrt") {
    val s = spark; import s.implicits._
    val docs = ((0 until 100).map(i => (i.toLong, "big")) ++
      (100 until 125).map(i => (i.toLong, "small"))).toDF("doc_id", "src")
    val rates = MixtureSampler.rates(docs, "src").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rates("small") == 1.0)
    assert(rates("big") == math.sqrt(25.0 / 100.0))
    val kept = MixtureSampler.temperatureSample(docs, "src", "doc_id")
    assert(kept.filter(col("src") === "small").count() == 25L)
    // the kept set is exactly the hash-score filter replayed by hand
    val expectBig = docs.filter(col("src") === "big")
      .filter(RandomUnderSampler.hashKeepScore(col("doc_id"), 42L) < math.sqrt(0.25))
      .count()
    assert(kept.filter(col("src") === "big").count() == expectBig)
    assert(expectBig > 30L && expectBig < 70L) // hash spreads ~ uniformly
  }

  test("alpha=1.0 is a no-op (native proportions)") {
    val s = spark; import s.implicits._
    val docs = (0 until 60).map(i => (i.toLong, s"s${i % 3}")).toDF("doc_id", "src")
    assert(MixtureSampler.temperatureSample(docs, "src", "doc_id", alpha = 1.0).count() == 60L)
  }
}

class ChunkingSpec extends SparkSpec {
  import graft.operators.Chunking

  test("boundary cases: short doc, exact budget, tail coverage, overlap") {
    val s = spark; import s.implicits._
    // budget 4, overlap 1 → stride 3; 10 tokens → ceil(9/3) = 3 chunks
    val docs = Seq(
      (1L, "t1 t2"),                                // n=2  < budget → 1 chunk
      (2L, "t1 t2 t3 t4"),                          // n=4 == budget → 1 chunk
      (3L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")        // 3 chunks: [1..4],[4..7],[7..10]
    ).toDF("doc_id", "text")
    val r = Chunking.tokenChunks(docs, budget = 4, overlap = 1)
      .collect().groupBy(_.getLong(0))
    assert(r(1L).length == 1 && r(1L).head.getAs[Int]("n_chunk_tokens") == 2)
    assert(r(2L).length == 1 && r(2L).head.getAs[Int]("n_chunk_tokens") == 4)
    assert(r(3L).length == 3)
    assert(r(3L).map(_.getAs[Int]("n_chunk_tokens")).toSeq == Seq(4, 4, 4))
    // overlap: chunk 1 starts at token 4 (1-based), i.e. shares t4 with chunk 0
  }

  test("chunking plans with zero exchanges (scan → project → generate)") {
    val docs = graft.Tables.load(spark, TestSpark.sf0001, "documents")
    val p = Chunking.tokenChunks(docs, budget = 16, overlap = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "chunking must not shuffle:\n" + p)
  }
}

class RepetitionScoreSpec extends SparkSpec {

  test("degenerate, clean, and empty documents") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "x x x x x"),      // one token 5× → top_token_frac 1.0, all bigrams equal
      (2L, "a b c d e f"),    // all distinct, long enough that 1/n ≤ 0.2
      (3L, "spam ham spam ham spam") // alternating: bigrams "spam ham"×2 + "ham spam"×2
    ).toDF("doc_id", "text")
    val r = RepetitionScore.score(docs).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Double]("top_token_frac") == 1.0)
    assert(r(1L).getAs[Double]("dup_bigram_frac") == 0.75) // 4 bigrams, 1 distinct
    assert(r(1L).getAs[Boolean]("repetitive"))
    assert(r(2L).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(r(2L).getAs[Double]("top_token_frac") == 1.0 / 6)
    assert(!r(2L).getAs[Boolean]("repetitive"))
    assert(r(3L).getAs[Double]("dup_bigram_frac") == 0.5) // 4 bigrams, 2 distinct
    assert(r(3L).getAs[Double]("top_token_frac") == 0.6)  // spam 3/5
  }
}
