package graft

import graft.functions._
import org.apache.spark.sql.functions._

class GeoFunctionsSpec extends SparkSpec {

  private def dist(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val s = spark; import s.implicits._
    Seq((lat1, lon1, lat2, lon2)).toDF("a", "b", "c", "d")
      .select(GeoFunctions.haversineMeters(col("a"), col("b"), col("c"), col("d")))
      .head.getDouble(0)
  }

  test("haversine matches known city-pair distances within 1%") {
    // Montréal (45.5017, -73.5673) ↔ Toronto (43.6532, -79.3832) ≈ 504 km
    assert(math.abs(dist(45.5017, -73.5673, 43.6532, -79.3832) - 504000) < 5000)
    // Paris (48.8566, 2.3522) ↔ London (51.5074, -0.1278) ≈ 344 km
    assert(math.abs(dist(48.8566, 2.3522, 51.5074, -0.1278) - 344000) < 3500)
  }

  test("haversine is symmetric, zero on identity, non-negative (seeded sweep)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(50)((rnd.between(-80.0, 80.0), rnd.between(-179.0, 179.0),
      rnd.between(-80.0, 80.0), rnd.between(-179.0, 179.0)))
    val rows = pts.toDF("a", "b", "c", "d").select(
      GeoFunctions.haversineMeters(col("a"), col("b"), col("c"), col("d")).as("ab"),
      GeoFunctions.haversineMeters(col("c"), col("d"), col("a"), col("b")).as("ba")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
      assert(r.getDouble(0) >= 0)
    }
    assert(dist(45.5, -73.6, 45.5, -73.6) === 0.0)
  }
}

class DateSolarSpec extends SparkSpec {

  test("cyclic encodings stay on the unit circle and close the period") {
    val s = spark; import s.implicits._
    val df = (0 to 23).toDF("h").select(
      DateFeatures.cyclicCos(col("h"), 24).as("c"),
      DateFeatures.cyclicSin(col("h"), 24).as("s"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) * r.getDouble(0) + r.getDouble(1) * r.getDouble(1) - 1.0) < 1e-12)
    }
    // hour 0 and hour 24 coincide
    val e = Seq(0, 24).toDF("h").select(DateFeatures.cyclicCos(col("h"), 24)).collect()
    assert(math.abs(e(0).getDouble(0) - e(1).getDouble(0)) < 1e-12)
  }

  test("isoDayOfWeek: 2024-01-01 is a Monday, 2024-01-07 a Sunday") {
    val s = spark; import s.implicits._
    val r = Seq("2024-01-01", "2024-01-07").toDF("d")
      .select(DateFeatures.isoDayOfWeek(to_date(col("d"))))
      .collect().map(_.getInt(0))
    assert(r.toSeq == Seq(1, 7))
  }

  test("solar elevation bounded in [-90, 90] and higher at noon than midnight") {
    val s = spark; import s.implicits._
    val rows = (0 to 23).map(h => (172, h, 45.5, -73.6, -5.0)) // summer solstice, Montréal
    val elev = rows.toDF("doy", "hour", "lat", "lon", "off")
      .select(SolarFeatures.solarElevation(col("doy"), col("hour"), col("lat"), col("lon"), col("off")))
      .collect().map(_.getDouble(0))
    assert(elev.forall(e => e >= -90 && e <= 90))
    assert(elev(12) > elev(0) + 30)
  }

  test("montrealUtcOffset replays the reference DST table, boundary days included") {
    val s = spark; import s.implicits._
    // the reference compares DATE (= its midnight) against the 02:00
    // switch instants, so the switch day itself keeps the OLD offset
    val cases = Seq(
      "2017-03-11" -> -5, "2017-03-12" -> -5, "2017-03-13" -> -4,
      "2017-11-04" -> -4, "2017-11-05" -> -4, "2017-11-06" -> -5,
      "2012-03-11" -> -5, "2012-03-12" -> -4,
      "2018-11-04" -> -4, "2018-11-05" -> -5,
      "2019-07-01" -> -5) // outside the 2012-2018 table: reference's otherwise
    val got = cases.map(_._1).toDF("d")
      .select(SolarFeatures.montrealUtcOffset(to_date(col("d"))))
      .collect().map(_.getInt(0))
    assert(got.toSeq == cases.map(_._2))
  }

  test("golden: noon elevation at the 2017 Montréal DST boundaries") {
    val s = spark; import s.implicits._
    // independently hand-computed from the published formulas (NOT via
    // the Column implementation): Montréal 45.5017, -73.5673, hour 12,
    // offset from the DST rule on each side of both 2017 switches
    val golden = Seq(
      ("2017-03-12", 71, 40.04268570400758), // spring-forward day: still -5
      ("2017-03-13", 72, 40.213846327608664), // first -4 day
      ("2017-11-05", 309, 27.996473517833298), // fall-back day: still -4
      ("2017-11-06", 310, 26.642190323673155)) // back to -5
    val got = golden.map(_._1).toDF("d")
      .select(SolarFeatures.solarElevation(
        dayofyear(to_date(col("d"))), lit(12), lit(45.5017), lit(-73.5673),
        SolarFeatures.montrealUtcOffset(to_date(col("d")))))
      .collect().map(_.getDouble(0))
    golden.zip(got).foreach { case ((_, _, expect), actual) =>
      assert(math.abs(actual - expect) < 1e-9, s"expected $expect, got $actual")
    }
  }
}

class TextFunctionsSpec extends SparkSpec {

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    val s = spark; import s.implicits._
    Seq(text).toDF("text").select(c).head.getAs[T](0)
  }

  test("token and bpeish counts") {
    assert(one[Int](TextFunctions.tokenCount(col("text")), "The quick  brown fox") == 4)
    assert(one[Int](TextFunctions.bpeishTokenCount(col("text")), "ab3,cd") == 4) // ab, 3, ",", cd
  }

  test("punct ratio and mean token length") {
    assert(one[Double](TextFunctions.punctRatio(col("text")), "ab,.") == 0.5)
    assert(one[Double](TextFunctions.meanTokenLength(col("text")), "ab abcd") == 3.0)
  }

  test("langId picks the marker language; und when nothing matches") {
    assert(one[String](TextFunctions.langId(col("text")), "the cat and the dog is here") == "en")
    assert(one[String](TextFunctions.langId(col("text")), "le chat et la table est") == "fr")
    assert(one[String](TextFunctions.langId(col("text")), "zzz qqq") == "und")
  }

  test("langIdFromTokens equals langId") {
    val s = spark; import s.implicits._
    val df = Seq("the cat and the dog", "der hund und die katze", "xyz").toDF("text")
    val both = df.select(
      TextFunctions.langId(col("text")).as("a"),
      TextFunctions.langIdFromTokens(TextFunctions.tokens(col("text"))).as("b")).collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("identical texts: identical fingerprint and simhash") {
    val s = spark; import s.implicits._
    val rows = Seq("the quick brown fox", "the quick brown fox").toDF("text")
      .select(TextFunctions.simHash64(col("text")).as("fp"),
        TextFunctions.tokenSetFingerprint(col("text")).as("tf")).collect()
    assert(rows(0).getLong(0) == rows(1).getLong(0))
    assert(rows(0).getString(1) == rows(1).getString(1))
  }

  test("shingles: sliding n-grams, empty below n tokens") {
    val s = spark; import s.implicits._
    val r = Seq("a b c d", "a b").toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("sh")).collect()
    assert(r(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r(1).getSeq[String](0).isEmpty)
  }
}
