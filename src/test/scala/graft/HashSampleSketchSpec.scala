package graft

import graft.operators.HashSampleSketch
import org.apache.spark.sql.functions._

/** Bottom-k-by-hash quantile summary (X191): determinism, the
  * merge-closure property that justifies it at scale, the uniform-
  * sample accuracy bound, and the no-global-sort plan.
  */
class HashSampleSketchSpec extends SparkSpec {

  import spark.implicits._

  private lazy val df = spark.range(0, 20000)
    .select(col("id"), (col("id") % 1000).cast("double").as("v"))

  test("deterministic across runs and repartitionings") {
    val a = HashSampleSketch.quantiles(df, col("id"), col("v"), 256,
      Seq(0.25, 0.5, 0.75)).collect().toSeq
    val b = HashSampleSketch.quantiles(df.repartition(7), col("id"), col("v"), 256,
      Seq(0.25, 0.5, 0.75)).collect().toSeq
    assert(a === b, "sample must not depend on partitioning")
  }

  test("merge closure: bottom-k of a union == re-keep-k over the parts' bottom-k") {
    val (p1, p2) = (df.filter(col("id") % 2 === 0), df.filter(col("id") % 2 === 1))
    val whole = HashSampleSketch.bottomK(df, col("id"), col("v"), 128).collect().toSet
    val merged = HashSampleSketch.bottomK(p1, col("id"), col("v"), 128)
      .unionByName(HashSampleSketch.bottomK(p2, col("id"), col("v"), 128))
      .orderBy(col("_rk"), col("value")).limit(128).collect().toSet
    assert(merged === whole, "the sketch must merge without coordination")
  }

  test("accuracy: |F(est_p) - p| within the uniform-sample bound at k=1024") {
    val est = HashSampleSketch.quantiles(df, col("id"), col("v"), 1024,
        Seq(0.1, 0.25, 0.5, 0.75, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1))
    val n = df.count().toDouble
    est.foreach { case (p, e) =>
      // exact ECDF of the estimate (v = id % 1000, uniform)
      val below = df.filter(col("v") <= e).count().toDouble / n
      assert(math.abs(below - p) < 0.06,
        f"p=$p est=$e F(est)=$below%.3f — outside the ~2/sqrt(k) band")
    }
  }

  test("grouped variant: small groups are exact; big groups match the ungrouped sketch") {
    val g = spark.range(0, 4000).select(
      when(col("id") < 20, lit("small")).otherwise(lit("big")).as("grp"),
      col("id"), col("id").cast("double").as("v"))
    val got = HashSampleSketch.quantilesByGroup(g, col("grp"), col("id"), col("v"),
        k = 256, probs = Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // the 20-row group is below k: its median is the EXACT order
    // statistic value at floor(0.5 * 19) = index 9 -> 9.0
    assert(got("small") === 9.0)
    // the big group's estimate equals running the ungrouped sketch on
    // just that group's rows (same hash, same k)
    val solo = HashSampleSketch.quantiles(g.filter(col("grp") === "big"),
        col("id"), col("v"), 256, Seq(0.5))
      .collect().head.getDouble(1)
    assert(got("big") === solo)
  }

  test("plan: sample selection is TakeOrderedAndProject, never a global sort") {
    val p = HashSampleSketch.bottomK(df, col("id"), col("v"), 64)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      "bottom-k must plan per-partition top-k + driver merge:\n" + p)
  }
}
