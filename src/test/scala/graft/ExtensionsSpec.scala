package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the SQL FunctionRegistry entries resolve and compute
  * the same values as the DataFrame-API primitives they wrap.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot is registered and computes the dot product") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("graft_haversine_m matches a known city pair within 0.5%") {
    // Montréal (45.5019, -73.5674) ↔ Québec City (46.8131, -71.2075):
    // great-circle ≈ 233 km
    val r = spark.sql(
      "SELECT graft_haversine_m(45.5019D, -73.5674D, 46.8131D, -71.2075D) AS m")
      .collect().head.getDouble(0)
    assert(math.abs(r - 233000.0) / 233000.0 < 0.005, s"got $r")
  }

  test("graft_hamming64 counts differing bits") {
    val r = spark.sql("SELECT graft_hamming64(CAST(0 AS BIGINT), CAST(255 AS BIGINT)) AS h")
      .collect().head.getInt(0)
    assert(r == 8)
  }

  test("graft_pip ray-casts against a literal polygon; SQL == DataFrame path") {
    import org.apache.spark.sql.functions._
    // unit square: centre inside, far point outside
    val rows = spark.sql(
      """SELECT graft_pip(0.5D, 0.5D, array(0D, 0D, 1D, 0D, 1D, 1D, 0D, 1D)) AS a,
        |       graft_pip(2.0D, 2.0D, array(0D, 0D, 1D, 0D, 1D, 1D, 0D, 1D)) AS b
        |""".stripMargin).collect().head
    assert(rows.getBoolean(0) && !rows.getBoolean(1))
    // concave polygon (arrowhead): the notch point is OUTSIDE
    val arrow = Seq(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 2.0, 1.5, 0.0, 4.0)
    val df = spark.range(1).select(
      graft.functions.GeoFunctions.pointInPolygon(lit(2.0), lit(2.5), arrow).as("notch"),
      graft.functions.GeoFunctions.pointInPolygon(lit(2.0), lit(0.5), arrow).as("body"))
      .collect().head
    assert(!df.getBoolean(0), "point in the concave notch is outside")
    assert(df.getBoolean(1), "point in the solid body is inside")
    val viaSql = spark.sql(
      "SELECT graft_pip(2.0D, 0.5D, array(0D, 0D, 4D, 0D, 4D, 4D, 2D, 1.5D, 0D, 4D)) AS p")
      .collect().head.getBoolean(0)
    assert(viaSql == df.getBoolean(1))
  }

  test("SQL and DataFrame paths produce identical doubles") {
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT graft_haversine_m(45.0D, -74.0D, 45.5D, -73.5D) AS m").collect().head.getDouble(0)
    val viaDf = spark.range(1).select(
      graft.functions.GeoFunctions.haversineMeters(
        lit(45.0), lit(-74.0), lit(45.5), lit(-73.5)).as("m"))
      .collect().head.getDouble(0)
    assert(viaSql == viaDf)
  }
}
