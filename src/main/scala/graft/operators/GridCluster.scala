package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-density spatial clustering (DBSCAN's scalable cousin): snap
  * points to fixed cells, keep cells with ≥ minPts points, and merge
  * 8-adjacent dense cells into clusters via the shared
  * [[Dedup.connectedComponents]] label propagation — hotspot detection
  * over accident/event coordinates without any pairwise distance join.
  *
  * Scale shape: the only full-data pass is the map-side-combined cell
  * count; everything after runs on the DENSE-CELL frame (bounded by
  * area/cell², not by row count). Adjacency is a self-equi-join on the
  * 8 neighbor cell ids (explode ×8 then equi-join — never a distance
  * predicate), and the component merge is the same logarithmic
  * label-propagation loop the dedup family uses. This is how
  * billion-point hotspot maps are actually built.
  */
object GridCluster {

  private def cellId(cx: String, cy: String) = col(cx) * 1000000L + col(cy)

  /** Dense-cell clusters. Input: (`xCol`, `yCol`) point coordinates.
    * Output: one row per dense cell — (cx, cy, n_points, cluster_id)
    * where cluster_id is the minimum cell id of the cell's connected
    * component (diagonal adjacency counts).
    *
    * @param cellSize grid pitch in coordinate units (x/y floor-divided)
    * @param minPts   density threshold: cells with fewer points drop
    *                 before clustering (and act as cluster separators)
    */
  def clusters(points: DataFrame, xCol: String, yCol: String,
      cellSize: Double, minPts: Long): DataFrame = {
    require(cellSize > 0 && minPts >= 1)
    val dense = points
      .select(floor(col(xCol) / cellSize).cast("long").as("cx"),
        floor(col(yCol) / cellSize).cast("long").as("cy"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n_points"))
      .filter(col("n_points") >= minPts)
      .withColumn("cell", cellId("cx", "cy"))

    // 8-neighborhood as an equi-join: each dense cell emits its 8
    // neighbor ids; an edge exists where an emitted id hits a dense
    // cell. Self-pairs and direction dups are harmless to CC.
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val emitted = dense.select(col("cell").as("id_a"),
        explode(array(offsets: _*)).as("o"),
        col("cx"), col("cy"))
      .select(col("id_a"),
        ((col("cx") + col("o.dx")) * 1000000L + (col("cy") + col("o.dy"))).as("id_b"))
    val edges = emitted.join(dense.select(col("cell").as("id_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"))
    // isolated dense cells have no edge — seed them as self-loops so
    // they come back as singleton clusters
    val withSelf = edges.unionByName(
      dense.select(col("cell").as("id_a"), col("cell").as("id_b")))

    val labels = Dedup.connectedComponents(withSelf, "id_a", "id_b")
    dense.join(labels.withColumnRenamed("doc_id", "cell"), Seq("cell"))
      .select(col("cx"), col("cy"), col("n_points"),
        col("component").as("cluster_id"))
  }
}
