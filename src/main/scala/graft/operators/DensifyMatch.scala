package graft.operators

import graft.functions.GeoFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's densify-and-rematch accident→street assignment
  * (`/root/reference/src/preprocess.py:99-221`): each accident is matched
  * to the nearest POINT of its `kPreselect` center-nearest streets; when
  * that nearest point is farther than `maxDistanceM`, the candidate
  * streets' polylines are densified with midpoints of consecutive points
  * (the reference's rolling-avg window over the next row, W3) and the
  * match is recomputed over the denser point set; finally one street per
  * accident is kept by distance to the street CENTER (the reference's
  * `final_match` dedup).
  *
  * Scale shape vs the reference: preselection is the grid-bucketed
  * `NearestMatch.kNearest` instead of a cross join against all centers;
  * densification runs only over the straggler accidents' candidate
  * streets (few, by construction) and over the DISTINCT point set of
  * each street — the reference's window runs over the
  * (accident × street-point) fan-out and averages across rows of
  * different accidents, which multiplies window input by the preselect
  * factor for identical output after its dropDuplicates.
  */
object DensifyMatch {

  def densifyAndRematch(accidents: DataFrame, roadPoints: DataFrame,
      accId: String = "accident_id", streetId: String = "street_id",
      accLat: String = "loc_lat", accLon: String = "loc_long",
      coordLat: String = "coord_lat", coordLon: String = "coord_long",
      centerLat: String = "center_lat", centerLon: String = "center_long",
      kPreselect: Int = 5, maxDistanceM: Double = 10.0,
      cellDeg: Double = 0.08, maxAbsLatDeg: Double = 60.0,
      preselectExhaustive: Boolean = false): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val acc = accidents.select(col(accId), col(accLat), col(accLon))
    val pts = roadPoints
      .select(col(streetId), col(coordLat).as("_p_lat"), col(coordLon).as("_p_lon"))
      .distinct()
    val centers = roadPoints
      .select(col(streetId), col(centerLat).as("_ct_lat"), col(centerLon).as("_ct_lon"))
      .distinct()

    def accToPoint: Column =
      haversineMeters(col(accLat), col(accLon), col("_p_lat"), col("_p_lon"))
    // deterministic total order: distance, then street, then point.
    // The distance is projected to `_d` FIRST and the window orders by
    // that column — ordering by the haversine expression directly would
    // re-evaluate the 4-trig formula inside the sort on every comparison
    // row in addition to the projection.
    def nearestPoint(cands: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(accId))
        .orderBy(col("_d"), col(streetId), col("_p_lat"), col("_p_lon"))
      cands.withColumn("_d", accToPoint)
        .withColumn("_rk", row_number().over(w))
        .filter(col("_rk") === 1)
        .drop("_rk")
    }

    // 1. preselect: kPreselect center-nearest streets per accident via the
    //    grid-bucketed kNN (the reference cross-joins all centers,
    //    preprocess.py:59-93 — fatal at scale). Persisted: feeds the
    //    first match AND the straggler rematch.
    //    `preselectExhaustive` short-circuits to the broadcast cross join
    //    + WindowGroupLimit when the CENTER table is known-small (city
    //    street centers fit comfortably; the grid's ~6 extra stages cost
    //    more than they save below ~10k rows). Both paths are exact.
    val pre = NearestMatch.kNearest(acc, centers, kPreselect,
        leftId = accId, rightId = streetId,
        latL = accLat, lonL = accLon, latR = "_ct_lat", lonR = "_ct_lon",
        cellDeg = cellDeg, maxAbsLatDeg = maxAbsLatDeg,
        exhaustive = preselectExhaustive)
      .select(col(accId), col(accLat), col(accLon), col(streetId))
      .persist(lvl)

    // 2. first match: nearest actual street point among the preselected
    //    streets (preprocess.py:99-123). Persisted: consumed by both
    //    branch filters.
    val first = nearestPoint(pre.join(pts, streetId)).persist(lvl)
    val correct = first.filter(col("_d") < maxDistanceM)
      .select(col(accId), col(streetId), lit(false).as("rematched"))

    // 3. stragglers: densify their candidate streets' polylines with
    //    consecutive-point midpoints (avg over rows [current, next]
    //    ordered along the line — preprocess.py:161-175) and re-rank.
    val stragPre = pre.join(
      first.filter(col("_d") >= maxDistanceM).select(col(accId)), accId)
    val stragPts = pts
      .join(stragPre.select(col(streetId)).distinct(), Seq(streetId), "left_semi")
      .persist(lvl) // two consumers: midpoint window + the union below
    val wd = Window.partitionBy(col(streetId))
      .orderBy(col("_p_lon"), col("_p_lat")).rowsBetween(0, 1)
    val densified = stragPts
      .select(col(streetId),
        avg(col("_p_lat")).over(wd).as("_p_lat"),
        avg(col("_p_lon")).over(wd).as("_p_lon"))
      .union(stragPts)
      .dropDuplicates(streetId, "_p_lat", "_p_lon")
    val rematch = nearestPoint(stragPre.join(densified, streetId))
      .select(col(accId), col(streetId), lit(true).as("rematched"))

    // 4. one street per accident by distance to the street CENTER
    //    (preprocess.py:206-221), deterministic tie-break on street id.
    val wf = Window.partitionBy(col(accId))
      .orderBy(haversineMeters(col(accLat), col(accLon), col("_ct_lat"), col("_ct_lon")),
        col(streetId))
    correct.unionByName(rematch)
      .join(centers, streetId)
      .join(acc, accId)
      .withColumn("_rk", row_number().over(wf))
      .filter(col("_rk") === 1)
      .select(col(accId), col(streetId), col("rematched"))
  }
}
