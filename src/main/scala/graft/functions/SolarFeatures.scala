package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Solar-geometry features as pure column expressions (no UDFs).
  *
  * Same astronomy as the reference (`src/solar_features.py:6-79`):
  * declination angle, equation of time, time correction, hour angle →
  * solar elevation in degrees. The DST case-expression is generalized to a
  * caller-supplied UTC-offset column (the reference hard-codes the
  * 2012-2018 US/Eastern switch dates).
  */
object SolarFeatures {

  private val TwoPi = 2.0 * math.Pi

  /** Solar declination (radians) from day-of-year. */
  def declination(doy: Column): Column =
    radians(lit(-23.45) * cos(lit(TwoPi / 365.0) * (doy + lit(10))))

  /** Equation of time (minutes) from day-of-year. */
  def equationOfTime(doy: Column): Column = {
    val d = doy * lit(TwoPi / 365.0)
    lit(-7.655) * sin(d) + lit(9.873) * sin(d * lit(2) + lit(3.588))
  }

  /** Hour angle (radians) for a local clock `hour` (0-23, taken at the
    * half-hour midpoint), longitude in degrees and UTC offset in hours.
    */
  def hourAngle(doy: Column, hour: Column, lonDeg: Column, utcOffsetHours: Column): Column = {
    val timeCorrection = lit(4) * (lonDeg - lit(15) * utcOffsetHours) + equationOfTime(doy)
    val localSolarHour = hour + lit(0.5) + timeCorrection / 60
    lit(0.2618) * (localSolarHour - lit(12))
  }

  /** Solar elevation angle in degrees. The asin argument (cosine of the
    * zenith angle) is clamped to [-1, 1]: when latitude equals the
    * declination and the hour angle is ~0 it can round a few ulp above
    * 1, and asin would return NaN (same ulp edge as the haversine
    * intermediate). No-op for in-domain values.
    */
  def solarElevation(doy: Column, hour: Column, latDeg: Column, lonDeg: Column,
      utcOffsetHours: Column): Column = {
    val dec = declination(doy)
    val ha = hourAngle(doy, hour, lonDeg, utcOffsetHours)
    degrees(asin(greatest(least(
      sin(dec) * sin(radians(latDeg)) + cos(dec) * cos(radians(latDeg)) * cos(ha),
      lit(1.0)), lit(-1.0))))
  }

  /** The reference's exact Montréal UTC-offset rule
    * (`src/solar_features.py:47-79`): −4 h between the 02:00 DST
    * switch instants of each year 2012–2018, −5 h otherwise. The
    * comparisons replicate the reference's date-vs-datetime promotion
    * byte-for-byte: a DATE compares as its midnight, so the
    * spring-forward day itself is still −5 (midnight < 02:00) and the
    * fall-back day is still −4 — the off-by-one-day semantics the
    * trained models actually saw. Outside 2012–2018 the rule returns
    * −5 like the reference (its `otherwise` branch).
    */
  def montrealUtcOffset(date: Column): Column = {
    val dst = Seq(
      ("2012-03-11 02:00:00", "2012-11-04 02:00:00"),
      ("2013-03-10 02:00:00", "2013-11-03 02:00:00"),
      ("2014-03-09 02:00:00", "2014-11-02 02:00:00"),
      ("2015-03-08 02:00:00", "2015-11-01 02:00:00"),
      ("2016-03-13 02:00:00", "2016-11-06 02:00:00"),
      ("2017-03-12 02:00:00", "2017-11-05 02:00:00"),
      ("2018-03-11 02:00:00", "2018-11-04 02:00:00"))
    val ts = date.cast("timestamp")
    val inDst = dst.map { case (a, b) =>
      ts > to_timestamp(lit(a)) && ts < to_timestamp(lit(b))
    }.reduce(_ || _)
    when(inDst, lit(-4)).otherwise(lit(-5))
  }

  /** Adds `solar_elevation` for rows with date, hour, lat, lon columns. */
  def addSolarFeatures(df: DataFrame, dateCol: String, hourCol: String,
      latCol: String, lonCol: String, utcOffsetHours: Column): DataFrame =
    df.withColumn("solar_elevation",
      solarElevation(dayofyear(col(dateCol)), col(hourCol), col(latCol), col(lonCol),
        utcOffsetHours))
}
