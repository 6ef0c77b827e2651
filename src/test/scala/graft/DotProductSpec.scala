package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {

  test("matches the HOF formulation bit-for-bit on random vectors") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextDouble() - 0.5), Array.fill(64)(rnd.nextDouble() - 0.5)))
    val df = rows.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diffs = df.select(VectorFunctions.dot(col("a"), col("b")).as("native"), hof.as("h"))
      .filter(col("native") =!= col("h")).count()
    assert(diffs == 0) // identical left-to-right summation
  }

  test("float arrays cast through; empty arrays give 0; null arrays give null") {
    val s = spark; import s.implicits._
    val f = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("a", "b")
    assert(f.select(VectorFunctions.dot(col("a"), col("b"))).head.getDouble(0) == 11.0)
    val e = Seq((Array.empty[Double], Array.empty[Double])).toDF("a", "b")
    assert(e.select(VectorFunctions.dot(col("a"), col("b"))).head.getDouble(0) == 0.0)
    val n = Seq((null.asInstanceOf[Array[Double]], Array(1.0))).toDF("a", "b")
    assert(n.select(VectorFunctions.dot(col("a"), col("b"))).head.isNullAt(0))
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    // parquet-backed input — a local Seq would constant-fold to a
    // LocalTableScan with no codegen stage at all
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val df = emb.select(VectorFunctions.dot(col("embedding"), col("embedding")).as("d"))
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(p.contains("*(1) Project [graft_dot"), p)
    assert(df.count() > 0)
  }
}
