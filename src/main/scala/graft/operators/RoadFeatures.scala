package graft.operators

import graft.functions.{GeoFunctions, StreetTypes}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-street features from the (street, point) table
  * (`/root/reference/src/road_network.py:36-100`): street length as the
  * maximum pairwise point distance (self-join J7 + group-max A3), the
  * KML folder name as `street_level`, and the name-derived
  * `street_type` — the reference's one hot-path Python UDF, here the
  * codegen'd `StreetTypes.streetType` when-chain.
  *
  * Scale note: the self-join is keyed on `street_id` (a plain equi-join
  * shuffle); cost is Σ points² PER STREET — bounded by segment
  * digitization density, never n² over the network. The max-aggregation
  * is map-side combined.
  */
object RoadFeatures {

  def features(roadPoints: DataFrame): DataFrame = {
    val a = roadPoints.select(
      col("street_id"), col("street_type"), col("street_name"),
      col("center_lat"), col("center_long"), col("coord_lat"), col("coord_long"))
    val b = roadPoints.select(
      col("street_id"),
      col("coord_lat").as("coord2_lat"), col("coord_long").as("coord2_long"))
    a.join(b, "street_id")
      .withColumn("dist_m", GeoFunctions.haversineMeters(
        col("coord_lat"), col("coord_long"), col("coord2_lat"), col("coord2_long")))
      .groupBy(col("street_id"), col("street_type").as("street_level"),
        col("street_name"), col("center_lat").as("loc_lat"), col("center_long").as("loc_long"))
      .agg(max(col("dist_m")).as("street_length"))
      .withColumn("street_type", StreetTypes.streetType(col("street_name")))
      .drop("street_name")
  }
}
