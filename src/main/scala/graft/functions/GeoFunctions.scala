package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic helpers as native column expressions (whole-stage codegen'd,
  * no UDFs).
  *
  * Re-expresses the haversine split used by the reference
  * (`src/road_network.py:310-324`: `distance_intermediate_formula` +
  * `distance_measure`, i.e. the movable-type haversine without the 2R
  * factor) — here exposed both split (for the kNN matcher, which only
  * needs a monotone distance measure and so skips the `2R*atan2` step
  * until the very end) and fused (metres).
  */
object GeoFunctions {

  /** Mean Earth radius in metres (IUGG). */
  val EarthRadiusM: Double = 6371000.0

  /** Haversine intermediate `a = sin^2(dLat/2) + sin^2(dLon/2)*cos(lat1)*cos(lat2)`.
    * Monotone in true distance — sufficient for nearest-neighbour ranking
    * without the sqrt/atan2, keeping the kNN hot loop cheap.
    */
  def haversineIntermediate(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    pow(sin(radians(lat1 - lat2) / 2), 2) +
      pow(sin(radians(lon1 - lon2) / 2), 2) * cos(radians(lat1)) * cos(radians(lat2))

  /** Angular distance (radians/2) from the haversine intermediate.
    * `1 - inter` is clamped at 0: for near-antipodal points the
    * intermediate can round a few ulp above 1, and an unclamped sqrt
    * returns NaN (found by FormulaPropertySpec). Exact for all
    * in-domain values — greatest(x, 0) is x whenever x >= 0.
    */
  def haversineMeasure(inter: Column): Column =
    atan2(sqrt(inter), sqrt(greatest(lit(1.0) - inter, lit(0.0))))

  /** Great-circle distance in metres. */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    haversineMeasure(haversineIntermediate(lat1, lon1, lat2, lon2)) * lit(2 * EarthRadiusM)

  /** Even-odd point-in-polygon against a fixed vertex list — the
    * native geofence expression; see
    * [[graft.expressions.PointInPolygon]] for why a Column unroll
    * doesn't survive real vertex counts.
    */
  def pointInPolygon(x: Column, y: Column, poly: Seq[Double]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.PointInPolygon(
      Bridge.expression(x.cast("double")), Bridge.expression(y.cast("double")), poly))
  }
}
