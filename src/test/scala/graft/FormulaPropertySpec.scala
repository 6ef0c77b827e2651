package graft

import graft.functions.{DateFeatures, GeoFunctions, SolarFeatures, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-bound tests (SURVEY §5): each formula is evaluated as the
  * ENGINE's column expression over a frame of ScalaCheck-generated
  * inputs (fixed seed → deterministic), and the invariant is asserted
  * over every row in one Spark pass — randomized coverage without one
  * job per case.
  */
class FormulaPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  test("haversine: symmetric, zero on identity, within [0, piR] on 500 random pairs") {
    val s = spark; import s.implicits._
    val g = for {
      lat1 <- Gen.choose(-89.0, 89.0); lon1 <- Gen.choose(-180.0, 180.0)
      lat2 <- Gen.choose(-89.0, 89.0); lon2 <- Gen.choose(-180.0, 180.0)
    } yield (lat1, lon1, lat2, lon2)
    val df = sample(g, 500, 42L).toDF("lat1", "lon1", "lat2", "lon2")
    def d(a: String, b: String, c: String, e: String) =
      GeoFunctions.haversineMeters(col(a), col(b), col(c), col(e))
    val bad = df.select(
        d("lat1", "lon1", "lat2", "lon2").as("dab"),
        d("lat2", "lon2", "lat1", "lon1").as("dba"),
        d("lat1", "lon1", "lat1", "lon1").as("daa"))
      // symmetry only up to ulp noise: the reversed call multiplies the
      // cos product in the other order. NaN (pre-clamp, for
      // near-antipodal points where the intermediate rounds above 1)
      // trips the range clause because NaN sorts above every double.
      .filter(abs($"dab" - $"dba") > 1e-6 || $"daa" =!= 0.0 ||
        $"dab" < 0.0 || $"dab" > math.Pi * GeoFunctions.EarthRadiusM + 1.0)
      .count()
    assert(bad == 0)
  }

  test("cyclic encodings: range [-1,1] and cos^2+sin^2 == 1 over random values") {
    val s = spark; import s.implicits._
    val df = sample(Gen.choose(-1e6, 1e6), 500, 7L).toDF("x")
    val bad = (for (period <- Seq(24.0, 7.0, 365.2425)) yield {
      val c = DateFeatures.cyclicCos($"x", period)
      val sn = DateFeatures.cyclicSin($"x", period)
      df.filter(abs(c) > 1.0 || abs(sn) > 1.0 ||
          abs(c * c + sn * sn - 1.0) > 1e-9)
        .count()
    }).sum
    assert(bad == 0)
  }

  test("solar elevation stays within [-90, 90] degrees over random (doy, hour, lat, lon)") {
    val s = spark; import s.implicits._
    val g = for {
      doy <- Gen.choose(1, 366); hour <- Gen.choose(0, 23)
      lat <- Gen.choose(-89.0, 89.0); lon <- Gen.choose(-180.0, 180.0)
      off <- Gen.choose(-12.0, 14.0)
    } yield (doy, hour, lat, lon, off)
    val df = sample(g, 500, 11L).toDF("doy", "hour", "lat", "lon", "off")
    val elev = SolarFeatures.solarElevation($"doy", $"hour", $"lat", $"lon", $"off")
    assert(df.filter(abs(elev) > 90.0).count() == 0)
  }

  test("quality score lands in {0, .25, .5, .75, 1} for arbitrary printable text") {
    val s = spark; import s.implicits._
    val df = sample(Gen.asciiPrintableStr, 300, 13L).toDF("text")
    val q = TextFunctions.qualityScore($"text", Seq("the", "and", "of"))
    assert(df.filter(!q.isin(0.0, 0.25, 0.5, 0.75, 1.0)).count() == 0)
  }

  test("hamming64: zero on identity, symmetric, bounded by 64, triangle inequality") {
    val s = spark; import s.implicits._
    val g = for {
      a <- Gen.choose(Long.MinValue, Long.MaxValue)
      b <- Gen.choose(Long.MinValue, Long.MaxValue)
      c <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (a, b, c)
    val df = sample(g, 500, 17L).toDF("a", "b", "c")
    def h(x: String, y: String) = TextFunctions.hamming64(col(x), col(y))
    val bad = df.filter(
        h("a", "a") =!= 0 || h("a", "b") =!= h("b", "a") ||
        h("a", "b") < 0 || h("a", "b") > 64 ||
        h("a", "c") > h("a", "b") + h("b", "c"))
      .count()
    assert(bad == 0)
  }

  test("dot product: commutative and matches scalar reference on random vectors") {
    val s = spark; import s.implicits._
    val g = Gen.listOfN(16, Gen.choose(-10.0, 10.0)).map(_.toArray)
    val rows = sample(Gen.zip(g, g), 200, 19L)
    val expected = rows.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    }
    val df = rows.zip(expected).map { case ((a, b), e) => (a, b, e) }
      .toDF("a", "b", "expected")
    val dot = graft.functions.VectorFunctions.dot($"a", $"b")
    val rdot = graft.functions.VectorFunctions.dot($"b", $"a")
    // left-to-right summation: x*y == y*x exactly per term, so both
    // directions and the scalar fold are the same IEEE sequence
    assert(df.filter(dot =!= rdot || dot =!= $"expected").count() == 0)
  }
}
