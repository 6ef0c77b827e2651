package graft

import graft.operators.TheilSen
import org.apache.spark.sql.functions._

/** Theil–Sen robust slope (X180). */
class TheilSenSpec extends SparkSpec {

  import spark.implicits._

  test("exact fit on a clean line: slope 2, intercept 1") {
    val pts = (1 to 9).map(i => (i.toLong, i.toDouble, 2.0 * i + 1.0)).toDF("id", "x", "y")
    val r = TheilSen.fit(pts, "id", "x", "y").head()
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 1.0)
    assert(r.getAs[Long]("n_sample") === 9L)
    assert(r.getAs[Long]("n_pairs") === 36L)
  }

  test("one wild outlier leaves the median slope untouched") {
    val clean = (1 to 20).map(i => (i.toLong, i.toDouble, 3.0 * i))
    val withOutlier = clean :+ ((99L, 21.0, 100000.0))
    val r = TheilSen.fit(withOutlier.toDF("id", "x", "y"), "id", "x", "y").head()
    assert(r.getAs[Double]("slope") === 3.0,
      "the median of pairwise slopes shrugs off a single corrupted point")
    // OLS on the same data would be pulled far off slope 3
    val ols = withOutlier.map { case (_, x, y) => (x, y) }
    val n = ols.size
    val (sx, sy) = (ols.map(_._1).sum, ols.map(_._2).sum)
    val (sxx, sxy) = (ols.map(p => p._1 * p._1).sum, ols.map(p => p._1 * p._2).sum)
    val olsSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(olsSlope > 100, s"OLS is wrecked ($olsSlope) where Theil-Sen is not")
  }

  test("vertical pairs are excluded; all-vertical input fails loudly") {
    val pts = Seq((1L, 5.0, 1.0), (2L, 5.0, 2.0), (3L, 6.0, 3.0)).toDF("id", "x", "y")
    val r = TheilSen.fit(pts, "id", "x", "y").head()
    assert(r.getAs[Long]("n_pairs") === 2L, "only the two x-distinct pairs count")
    val vertical = Seq((1L, 5.0, 1.0), (2L, 5.0, 2.0)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      TheilSen.fit(vertical, "id", "x", "y").collect()
    }
    assert(e.getMessage.contains("no slope-defining pairs"))
  }
}
