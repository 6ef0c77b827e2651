package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar feature engineering as pure column expressions.
  *
  * Covers the reference's date features (`src/preprocess.py:401-419`):
  * plain parts + cyclic (sin/cos) encodings so models see hour 23 and
  * hour 0 as neighbours.
  */
object DateFeatures {

  private val TwoPi = 2.0 * math.Pi

  /** cos component of a cyclic encoding with the given period. */
  def cyclicCos(c: Column, period: Double): Column = cos(c * lit(TwoPi / period))

  /** sin component of a cyclic encoding with the given period. */
  def cyclicSin(c: Column, period: Double): Column = sin(c * lit(TwoPi / period))

  /** ISO day-of-week (1 = Monday .. 7 = Sunday), portable across engines
    * (Spark's `dayofweek` is 1 = Sunday).
    */
  def isoDayOfWeek(c: Column): Column = (dayofweek(c) + lit(5)) % lit(7) + lit(1)

  /** Adds the reference's date feature set for a date column `dateCol` and
    * integer hour column `hourCol`.
    */
  def addDateFeatures(df: DataFrame, dateCol: String, hourCol: String): DataFrame = {
    val d = col(dateCol)
    df.withColumn("f_year", year(d))
      .withColumn("f_month", month(d))
      .withColumn("f_dayofweek", isoDayOfWeek(d))
      .withColumn("f_hour_cos", cyclicCos(col(hourCol), 24))
      .withColumn("f_hour_sin", cyclicSin(col(hourCol), 24))
      .withColumn("f_dom_cos", cyclicCos(dayofmonth(d), 31))
      .withColumn("f_dom_sin", cyclicSin(dayofmonth(d), 31))
      .withColumn("f_doy_cos", cyclicCos(dayofyear(d), 365))
      .withColumn("f_doy_sin", cyclicSin(dayofyear(d), 365))
  }
}
