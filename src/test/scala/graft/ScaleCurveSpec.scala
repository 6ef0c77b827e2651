package graft

import org.apache.spark.sql.functions._

/** The scale-curve AMPLIFIER's invariants — the measurement is only
  * meaningful if ×k data behaves like a k×-bigger real dataset:
  * FK-consistent joins (no cross-replica matches, no broken matches),
  * content decorrelation for documents (replicas share no words, so
  * pair operators don't measure copy multiplicity), and exact norm
  * preservation for embeddings (sign flips change direction, never
  * geometry within a replica).
  */
class ScaleCurveSpec extends SparkSpec {

  import spark.implicits._

  private lazy val ampDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_scale_spec_")
      .resolve("x2").toString
    ScaleCurve.amplify(spark, TestSpark.sf0001, d, 2)
    d
  }

  test("amplify x2 doubles every table and keeps FKs consistent") {
    Tables.names.foreach { n =>
      val base = Tables.load(spark, TestSpark.sf0001, n).count()
      val amped = Tables.load(spark, ampDir, n).count()
      assert(amped === base * 2, s"table $n")
    }
    // FK: the orders⋈customer match count must exactly double — keys
    // shifted on BOTH sides, so no replica-crossing matches and no
    // orphaned ones
    def matches(dir: String): Long =
      Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey")).count()
    assert(matches(ampDir) === matches(TestSpark.sf0001) * 2)
  }

  test("replica documents share no words with the originals (decorrelated content)") {
    val words = Tables.load(spark, ampDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val origWords = words.filter(col("doc_id") < 1000000000L).select(col("w")).distinct()
    val replWords = words.filter(col("doc_id") >= 1000000000L).select(col("w")).distinct()
    assert(origWords.join(replWords, Seq("w")).count() === 0L,
      "word-salting must make replica vocabulary disjoint from the original")
    // n_chars stays consistent with the salted text
    val bad = Tables.load(spark, ampDir, "documents")
      .filter(col("text").isNotNull && col("n_chars") =!= length(col("text")))
      .count()
    assert(bad === 0L, "n_chars must track the rewritten text")
  }

  test("replica embeddings preserve norms exactly (sign flips only)") {
    val norms = Tables.load(spark, ampDir, "embeddings")
      .select(col("vec_id"),
        aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double")).as("n2"))
    val orig = norms.filter(col("vec_id") < 1000000000L)
      .withColumnRenamed("n2", "n2o")
    val repl = norms.filter(col("vec_id") >= 1000000000L)
      .withColumn("vec_id", col("vec_id") - 1000000000L)
    val drift = orig.join(repl, Seq("vec_id"))
      .filter(abs(col("n2o") - col("n2")) > 1e-6).count()
    assert(drift === 0L, "per-(dim, replica) sign flips must not move any norm")
  }
}
