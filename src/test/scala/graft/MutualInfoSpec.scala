package graft

import graft.operators.MutualInfo

/** The label-leakage MI screen against closed-form values and a local
  * brute-force reimplementation: a dimension whose bin DETERMINES the
  * label scores exactly ln(#classes), a constant dimension scores
  * exactly 0, and arbitrary data matches the count-based formula.
  */
class MutualInfoSpec extends SparkSpec {

  import spark.implicits._

  test("perfect dependence scores ln(#classes); constant dimension scores 0") {
    // dim 0 = label * 0.2 (each label lands in its own 0.1-wide bin);
    // dim 1 constant (one bin -> independent by construction)
    val df = (0 until 400).map { i =>
      val label = i % 4
      (Seq(label * 0.2f, 0.05f), label)
    }.toDF("embedding", "label")
    val got = MutualInfo.labelLeakage(df, "embedding", "label")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val ln4 = BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) === ln4, s"deterministic dim must score ln(4): $got")
    assert(got(1) === 0.0, s"constant dim must score 0: $got")
  }

  test("matches the brute-force count formula on mixed data") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 500).map { _ =>
      val label = rnd.nextInt(3)
      // dim 0 correlates with the label + noise; dim 1 pure noise
      (Seq((label * 0.3 + rnd.nextGaussian() * 0.1).toFloat,
        (rnd.nextDouble() * 2 - 1).toFloat), label)
    }
    val got = MutualInfo.labelLeakage(rows.toDF("embedding", "label"),
        "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    def bin(x: Float): Long = {
      val v = math.round(x.toDouble * 1000000)
      val w = 100000L
      (v - java.lang.Math.floorMod(v, w)) / w
    }
    (0 until 2).foreach { d =>
      val cells: Map[(Long, Int), Int] =
        rows.groupBy(r => (bin(r._1(d)), r._2)).map { case (k, v) => k -> v.size }
      val n = rows.size.toDouble
      val nb: Map[Long, Int] =
        cells.toSeq.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
      val nl: Map[Int, Int] =
        cells.toSeq.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
      val mi = cells.map { case ((b, l), nbl) =>
        (nbl / n) * math.log(nbl * n / (nb(b).toDouble * nl(l)))
      }.sum
      val want = BigDecimal(mi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (_, gn, gmi) = got.find(_._1 == d).get
      assert(gn === rows.size.toLong)
      assert(math.abs(gmi - want) <= 1e-6, s"dim $d: $gmi vs $want")
    }
    // the correlated dimension must rank above the noise dimension
    assert(got.head._1 === 0, s"dim 0 carries the label signal: ${got.toSeq}")
  }
}
