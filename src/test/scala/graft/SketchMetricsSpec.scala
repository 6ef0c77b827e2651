package graft

import graft.operators.{KmvSketch, RankingMetrics, WeightedMedian}
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {

  test("below-k groups report exactly; above-k groups estimate within 25%") {
    val s = spark; import s.implicits._
    val df = ((1 to 10).map(i => ("small", i.toLong)) ++
      (1 to 5000).map(i => ("big", i.toLong))).toDF("grp", "key")
    val r = KmvSketch.distinctEstimate(df, "grp", "key", k = 64)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("small").getAs[Long]("n_exact") == 10L)
    assert(r("small").getAs[Double]("est") == 10.0)
    assert(r("small").getAs[Double]("rel_err") == 0.0)
    assert(r("big").getAs[Long]("n_exact") == 5000L)
    assert(r("big").getAs[Double]("rel_err") < 0.25,
      s"KMV estimate too far off: ${r("big")}")
  }

  test("k-smallest selection rides WindowGroupLimit, not a full sort") {
    val s = spark; import s.implicits._
    val df = (1 to 1000).map(i => ("g", i.toLong)).toDF("grp", "key")
    val p = KmvSketch.distinctEstimate(df, "grp", "key", k = 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "per-group k-smallest must push WindowGroupLimit:\n" + p)
  }
}

class WeightedMedianSpec extends SparkSpec {

  test("crossing at half the total weight; duplicate values collapse") {
    val s = spark; import s.implicits._
    // g1: values 1(w9), 2(w1) → cum(1)=9, 2·9 ≥ 10 → median 1
    // g2: 1(w1), 2(w1), 3(w2) → cum(2)=2, 2·2 ≥ 4 → median 2
    // g3: 5 appears twice w1+w2 → collapses to w3 of total 4 → median 5
    val df = Seq(
      ("g1", 1L, 9L), ("g1", 2L, 1L),
      ("g2", 1L, 1L), ("g2", 2L, 1L), ("g2", 3L, 2L),
      ("g3", 5L, 1L), ("g3", 5L, 2L), ("g3", 9L, 1L)
    ).toDF("grp", "v", "w")
    val r = WeightedMedian.weightedMedian(df, "grp", "v", "w")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("g1" -> 1L, "g2" -> 2L, "g3" -> 5L))
  }
}

class RankingMetricsSpec extends SparkSpec {

  test("perfect ranking → ndcg 1; relevant at rank 2 → mrr 0.5") {
    val s = spark; import s.implicits._
    // q1: rel at ranks 1,2 of 3 → dcg = idcg(2) → ndcg 1, mrr 1
    // q2: rel at rank 2 only → ndcg = 630930/1000000, mrr 0.5
    // q3: nothing relevant → 0/0, counted in n_zero
    val ranked = Seq(
      (1L, 1, 1L), (1L, 2, 1L), (1L, 3, 0L),
      (2L, 1, 0L), (2L, 2, 1L), (2L, 3, 0L),
      (3L, 1, 0L), (3L, 2, 0L)
    ).toDF("query_id", "rk", "rel")
    val r = RankingMetrics.ndcgMrr(ranked, "query_id", "rk", "rel").head()
    assert(r.getAs[Long]("n_queries") == 3L)
    assert(r.getAs[Long]("n_zero") == 1L)
    // mean ndcg = (1.0 + 0.630930 + 0) / 3
    assert(math.abs(r.getAs[Double]("mean_ndcg") - 0.54364333) < 1e-6)
    assert(math.abs(r.getAs[Double]("mean_mrr") - 0.5) < 1e-9)
  }
}
