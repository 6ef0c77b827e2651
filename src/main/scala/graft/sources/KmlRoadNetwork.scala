package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KML road-network source (SURVEY S4/S5): semi-structured XML →
  * one row per (street, point), re-expressing the reference's
  * BeautifulSoup extraction (`/root/reference/src/road_network.py:189-308`)
  * as a typed `flatMap` with scala-xml.
  *
  * Distribution model: one KML document per input row (the reference
  * parallelizes one KMZ file per RDD element, `road_network.py:257-264`);
  * parsing runs on executors, so a 10k-file network parses with no
  * driver involvement beyond listing. For KMZ, unzip to the `doc.kml`
  * bytes first (e.g. via `spark.read.format("binaryFile")` + an unzip in
  * the same flatMap).
  */
object KmlRoadNetwork {

  /** One (street, point) row. `nid` is the regex-extracted network id
    * from the placemark description (reference line 208).
    */
  case class RoadPoint(
      street_name: String, street_type: String,
      center_long: Double, center_lat: Double,
      coord_long: Double, coord_lat: Double, nid: String)

  private val NidRe = "(?s)<th>nid</th>\\s*<td>([a-f0-9]+)</td>".r
  private val UnknownRe = "(?s)<th>left_OfficialPlaceName</th>\\s*<td>Unknown</td>".r

  /** The reference's Montréal-island allowlist of Unknown-place nids
    * (`/root/reference/src/road_network_nids.py`, 1773 entries / 1681
    * distinct — the original list holds duplicates), shipped as a
    * resource so NRN parity on the Unknown-place rule is reproducible.
    * Loaded once per JVM; the set serializes into the parse closure.
    */
  lazy val montrealUnknownNids: Set[String] = {
    val in = getClass.getResourceAsStream("/road_network_nids.txt")
    require(in != null, "road_network_nids.txt resource missing")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toSet
    finally in.close()
  }

  /** Parse one KML document into (street, point) rows: every LineString
    * coordinate plus the center appended as an extra point (reference
    * lines 218-243). Placemarks in Unknown places are dropped unless
    * allowlisted (the reference's `unknow_file_included_nids`).
    */
  def parseKml(kml: String, includedUnknownNids: Set[String] = Set.empty): Seq[RoadPoint] = {
    val root = scala.xml.XML.loadString(kml)
    for {
      folder <- (root \\ "Folder").toSeq
      streetType = (folder \ "name").text
      placemark <- (folder \ "Placemark").toSeq
      streetName = (placemark \ "name").text
      // real NRN KMLs escape the description's embedded HTML (`.text`
      // unescapes it); tolerate unescaped markup too by also matching
      // against the serialized child nodes
      descNode = placemark \ "description"
      desc = descNode.text + descNode.flatMap(_.child).mkString
      nid = NidRe.findFirstMatchIn(desc).map(_.group(1)).getOrElse("")
      if !(UnknownRe.findFirstIn(desc).isDefined && !includedUnknownNids(nid))
      center = (placemark \ "MultiGeometry" \ "Point" \ "coordinates").text.trim.split(",")
      // skip placemarks without a parseable center point (polygon-only or
      // malformed features) instead of failing the whole ingestion task
      if center.length > 1 && center.forall(c => c.nonEmpty)
      coords = (placemark \ "MultiGeometry" \ "LineString" \ "coordinates").text.trim
        .split("\\s+").toSeq.map(_.split(",")).filter(_.length > 1) :+ center
      coord <- coords
    } yield RoadPoint(streetName, streetType,
      center(0).toDouble, center(1).toDouble,
      coord(0).toDouble, coord(1).toDouble, nid)
  }

  /** Distributed parse of a dataset of KML document strings. */
  def roadPoints(kmlDocs: Dataset[String],
      includedUnknownNids: Set[String] = Set.empty): DataFrame = {
    val spark = kmlDocs.sparkSession
    import spark.implicits._
    kmlDocs.flatMap(parseKml(_, includedUnknownNids)).toDF()
  }

  /** S4 binary ingestion: KMZ files (zip archives holding `doc.kml`) →
    * KML strings, via the `binaryFile` source — the Spark-4 shape of the
    * reference's `parallelize(files).map(unzip)` RDD shim
    * (`road_network.py:257-264`). Unzipping runs on executors; only the
    * entry named `entryName` is read from each archive.
    */
  def kmlFromKmz(spark: org.apache.spark.sql.SparkSession, path: String,
      entryName: String = "doc.kml"): Dataset[String] = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.kmz").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .map { bytes =>
        val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
        Iterator.continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .collectFirst { case e if e.getName == entryName =>
            new String(zin.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          }
          .getOrElse("")
      }
      .filter(_.nonEmpty)
  }

  /** The reference's street-id assignment (`road_network.py:290-299`):
    * some segments share a `nid`, so the unique id is
    * `concat(nid, row_number)` over distinct centers per nid ordered by
    * center_lat, joined back on the center. The window runs over the
    * DISTINCT (nid, center) set — tiny relative to the point rows — so
    * the full point table never shuffles through the window.
    */
  def withStreetIds(points: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("nid")).orderBy(col("center_lat"), col("center_long"))
    val ids = points.select(col("nid"), col("center_lat"), col("center_long")).distinct()
      .select(col("nid"), col("center_lat"), col("center_long"),
        concat(col("nid"), row_number().over(w)).as("street_id"))
    // join back on (nid, center): the reference joins on center alone
    // (road_network.py:301), which fans out point rows whenever two
    // DIFFERENT nids share rounded center coordinates — treated as a
    // reference bug, not behavior to replicate
    points.join(ids, Seq("nid", "center_lat", "center_long")).drop("nid")
  }
}
