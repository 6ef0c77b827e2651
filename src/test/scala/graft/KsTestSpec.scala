package graft

import graft.operators.KsTest
import org.apache.spark.sql.functions._

class KsTestSpec extends SparkSpec {

  test("identical samples → D = 0 (argmax ties resolve to smallest value)") {
    val s = spark; import s.implicits._
    val df = (1 to 50).flatMap(i => Seq(("A", i.toLong), ("B", i.toLong)))
      .toDF("g", "v")
    val r = KsTest.twoSample(df, "g", "v", "A", "B").head()
    assert(r.getAs[Long]("d_scaled") == 0L)
    assert(r.getAs[Double]("d") == 0.0)
    assert(r.getAs[Long]("at_v") == 1L)
  }

  test("disjoint supports → D = 1 exactly at the last A value") {
    val s = spark; import s.implicits._
    val df = ((1 to 5).map(i => ("A", i.toLong)) ++
      (11 to 15).map(i => ("B", i.toLong)) ++
      Seq(("C", 3L))).toDF("g", "v") // other groups ignored
    val r = KsTest.twoSample(df, "g", "v", "A", "B").head()
    assert(r.getAs[Long]("n1") == 5L && r.getAs[Long]("n2") == 5L)
    assert(r.getAs[Long]("d_scaled") == 25L)
    assert(r.getAs[Double]("d") == 1.0)
    assert(r.getAs[Long]("at_v") == 5L)
  }

  test("hand-computed mixed case: shifted sample") {
    val s = spark; import s.implicits._
    // A = {1,2,3,4}, B = {3,4,5,6}: D = max|F1·4 − F2·4| at v=2: |2·4 − 0| = 8 → 0.5
    val df = (Seq(1L, 2L, 3L, 4L).map(("A", _)) ++
      Seq(3L, 4L, 5L, 6L).map(("B", _))).toDF("g", "v")
    val r = KsTest.twoSample(df, "g", "v", "A", "B").head()
    assert(r.getAs[Long]("d_scaled") == 8L)
    assert(r.getAs[Double]("d") == 0.5)
    assert(r.getAs[Long]("at_v") == 2L)
  }
}
