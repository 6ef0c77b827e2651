package graft

import graft.operators.NoveltyRate
import org.apache.spark.sql.functions._

class NoveltyRateSpec extends SparkSpec {

  test("repeated trigrams stop being novel; short docs emit nothing") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "a b c d"),  // batch 0: "a b c", "b c d" — both new
      (1L, "a b c x"),  // batch 1: "a b c" seen, "b c x" new → 0.5
      (1L, "x y")       // too short, ignored
    ).toDF("batch", "text")
    val rows = NoveltyRate.perBatch(docs, "batch", "text", n = 3)
      .orderBy("batch").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_new") == 2L &&
      rows(0).getAs[Double]("novelty") == 1.0)
    assert(rows(1).getAs[Long]("n_distinct") == 2L &&
      rows(1).getAs[Long]("n_new") == 1L &&
      rows(1).getAs[Double]("novelty") == 0.5)
  }

  test("occurrence counts survive the distinct bookkeeping") {
    val s = spark; import s.implicits._
    val docs = Seq((0L, "a b a b a b")).toDF("batch", "text") // "a b a" ×2, "b a b" ×2
    val r = NoveltyRate.perBatch(docs, "batch", "text", n = 3).head()
    assert(r.getAs[Long]("n_occurrences") == 4L)
    assert(r.getAs[Long]("n_distinct") == 2L)
  }
}

class MutualNnSpec extends SparkSpec {

  test("only reciprocal top-1 pairs survive") {
    val s = spark; import s.implicits._
    // 1 and 2 point the same way (mutual); 3 prefers 2, but 2 prefers 1
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val nn = graft.operators.SimilaritySearch.bruteForceTopK(
        emb.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        emb, k = 1)
      .select(col("query_id").as("qa"), col("vec_id").as("qb"))
    val mutual = nn.alias("x")
      .join(nn.alias("y"),
        col("x.qb") === col("y.qa") && col("y.qb") === col("x.qa") &&
          col("x.qa") < col("x.qb"))
      .select(col("x.qa"), col("x.qb")).as[(Long, Long)].collect().toSeq
    assert(mutual == Seq((1L, 2L)))
  }
}
