package graft

import graft.operators.KmvSketch

/** KMV set algebra in both regimes: lossless (every sketch below k →
  * union/Jaccard/intersection come out EXACT — the Knuth multiplicative
  * hash is a bijection mod 2³², so small distinct keys never collide)
  * and estimating (k ≪ distinct counts → the O(1/√k) error bands).
  */
class KmvSetOpsSpec extends SparkSpec {

  import spark.implicits._

  test("below k, union/jaccard/intersection are exact") {
    // A = [0, 30), B = [20, 50): union 50, intersection 10, J = 0.2
    val df = ((0 until 30).map(i => ("A", i.toLong)) ++
      (20 until 50).map(i => ("B", i.toLong))).toDF("seg", "uid")
    val r = KmvSketch.setOpsPairwise(df, "seg", "uid", k = 64).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[String]("ga") === "A" && row.getAs[String]("gb") === "B")
    assert(row.getAs[Long]("m_union") === 50L)
    assert(row.getAs[Double]("est_union") === 50.0)
    assert(row.getAs[Double]("est_jaccard") === 0.2)
    assert(row.getAs[Double]("est_intersect") === 10.0)
  }

  test("above k, estimates land in the O(1/sqrt(k)) band") {
    // evens under 20000 vs multiples of 3 under 30000:
    // |A ∪ B| = 16666, |A ∩ B| = 3334, J ≈ 0.2
    val df = ((0 until 20000 by 2).map(i => ("A", i.toLong)) ++
      (0 until 30000 by 3).map(i => ("B", i.toLong))).toDF("seg", "uid")
    val row = KmvSketch.setOpsPairwise(df, "seg", "uid", k = 64).collect()(0)
    val eu = row.getAs[Double]("est_union")
    val ej = row.getAs[Double]("est_jaccard")
    val ei = row.getAs[Double]("est_intersect")
    // deterministic hash → fixed estimates; bands are 10x the observed
    // error so a k/constant tweak fails loudly, noise cannot
    assert(math.abs(eu - 16666.0) / 16666.0 < 0.05, s"est_union $eu")
    assert(math.abs(ej - 0.2) < 0.05, s"est_jaccard $ej")
    assert(math.abs(ei - 3334.0) / 3334.0 < 0.15, s"est_intersect $ei")
  }

  test("every unordered pair appears exactly once") {
    val df = (for {
      s <- Seq("x", "y", "z"); i <- 0 until 20
    } yield (s, i.toLong)).toDF("seg", "uid")
    val pairs = KmvSketch.setOpsPairwise(df, "seg", "uid", k = 8)
      .select($"ga", $"gb").as[(String, String)].collect().toSeq.sorted
    assert(pairs === Seq(("x", "y"), ("x", "z"), ("y", "z")))
  }
}
