package graft

import graft.functions.StreetTypes
import graft.sources._
import org.apache.spark.sql.functions._

class KmlRoadNetworkSpec extends SparkSpec {

  private def desc(nid: String, unknown: Boolean = false): String = {
    val place = if (unknown) "<th>left_OfficialPlaceName</th>\n<td>Unknown</td>\n" else ""
    s"<th>nid</th>\n<td>$nid</td>\n$place"
  }

  /** Two folders; street B appears with the same nid as C (dedup case);
    * street D is in an Unknown place (dropped unless allowlisted).
    */
  private val fixture =
    s"""<kml><Document>
       |<Folder><name>Artère</name>
       |  <Placemark><name>rue A</name>
       |    <description>${desc("aa11")}</description>
       |    <MultiGeometry>
       |      <Point><coordinates>-73.5,45.5</coordinates></Point>
       |      <LineString><coordinates>-73.49,45.49 -73.51,45.51</coordinates></LineString>
       |    </MultiGeometry></Placemark>
       |  <Placemark><name>rue B</name>
       |    <description>${desc("bb22")}</description>
       |    <MultiGeometry>
       |      <Point><coordinates>-73.6,45.6</coordinates></Point>
       |      <LineString><coordinates>-73.59,45.59</coordinates></LineString>
       |    </MultiGeometry></Placemark>
       |</Folder>
       |<Folder><name>Locale</name>
       |  <Placemark><name>rue C</name>
       |    <description>${desc("bb22")}</description>
       |    <MultiGeometry>
       |      <Point><coordinates>-73.7,45.7</coordinates></Point>
       |      <LineString><coordinates>-73.69,45.69</coordinates></LineString>
       |    </MultiGeometry></Placemark>
       |  <Placemark><name>rue D</name>
       |    <description>${desc("dd44", unknown = true)}</description>
       |    <MultiGeometry>
       |      <Point><coordinates>-73.8,45.8</coordinates></Point>
       |      <LineString><coordinates>-73.79,45.79</coordinates></LineString>
       |    </MultiGeometry></Placemark>
       |</Folder>
       |</Document></kml>""".stripMargin

  test("parseKml: folders, linestring points + appended center, nid regex, unknown filter") {
    val pts = KmlRoadNetwork.parseKml(fixture)
    // A: 2 line points + center; B: 1 + center; C: 1 + center; D dropped
    assert(pts.length == 3 + 2 + 2)
    val a = pts.filter(_.street_name == "rue A")
    assert(a.map(_.street_type).distinct == Seq("Artère"))
    assert(a.map(p => (p.coord_long, p.coord_lat)).contains((-73.5, 45.5))) // center appended
    assert(a.forall(p => p.nid == "aa11" && p.center_long == -73.5 && p.center_lat == 45.5))
    assert(!pts.exists(_.street_name == "rue D"))
  }

  test("unknown allowlist keeps nids in the included set") {
    val pts = KmlRoadNetwork.parseKml(fixture, includedUnknownNids = Set("dd44"))
    assert(pts.exists(_.street_name == "rue D"))
  }

  test("shipped Montréal nid allowlist: real resource, real nid survives Unknown filter") {
    val nids = KmlRoadNetwork.montrealUnknownNids
    // the reference list: 1773 lines, 1681 distinct 32-hex ids
    assert(nids.size == 1681)
    assert(nids.forall(_.matches("[0-9a-f]{32}")))
    val realNid = "73671c5348054b448b94358ac26ff548" // first entry of the reference list
    assert(nids(realNid))
    val doc =
      s"""<kml><Document><Folder><name>Locale</name>
         |  <Placemark><name>rue E</name>
         |    <description>${desc(realNid, unknown = true)}</description>
         |    <MultiGeometry>
         |      <Point><coordinates>-73.8,45.8</coordinates></Point>
         |      <LineString><coordinates>-73.79,45.79</coordinates></LineString>
         |    </MultiGeometry></Placemark>
         |</Folder></Document></kml>""".stripMargin
    assert(KmlRoadNetwork.parseKml(doc).isEmpty) // Unknown place, no allowlist
    assert(KmlRoadNetwork.parseKml(doc, nids).exists(_.street_name == "rue E"))
  }

  test("kmlFromKmz: binaryFile scan + executor-side unzip of doc.kml") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kmz_test").toString
    val zipPath = new java.io.File(dir, "net.kmz")
    val zout = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipPath))
    zout.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    zout.write("ignore me".getBytes)
    zout.putNextEntry(new java.util.zip.ZipEntry("doc.kml"))
    zout.write(fixture.getBytes("UTF-8"))
    zout.close()
    val docs = KmlRoadNetwork.kmlFromKmz(spark, dir)
    val pts = KmlRoadNetwork.roadPoints(docs)
    assert(pts.count() == 7) // same as parseKml on the fixture
  }

  test("withStreetIds dedups shared nids by center latitude order") {
    val s = spark; import s.implicits._
    val df = KmlRoadNetwork.roadPoints(Seq(fixture).toDS())
    val ids = KmlRoadNetwork.withStreetIds(df)
      .select("street_name", "street_id").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ids("rue A") == "aa111")
    assert(ids("rue B") == "bb221") // center_lat 45.6 < 45.7
    assert(ids("rue C") == "bb222")
  }
}

class DateGridSpec extends SparkSpec {

  test("leap vs non-leap year slot counts, no duplicates") {
    val g = DateGrid.dateHourGrid(spark, Seq(1996, 1997))
    assert(g.count() == (366 + 365) * 24L)
    assert(g.distinct().count() == (366 + 365) * 24L)
    val feb96 = g.filter(year(col("date")) === 1996 && month(col("date")) === 2).count()
    assert(feb96 == 29 * 24L)
  }

  test("negativeGrid hash-samples deterministically before feature joins") {
    val s = spark; import s.implicits._
    val grid = DateGrid.dateHourGrid(spark, Seq(1996))
    val keys = (1 to 10).map(_.toLong).toDF("street_id")
    val sampled = DateGrid.negativeGrid(grid, keys, "street_id", sampleFraction = 0.1)
    val n = sampled.count()
    assert(math.abs(n - 8784L) < 900, s"n=$n expected ~8784") // 10% of 87840
    assert(sampled.count() == n) // deterministic re-evaluation
    // P7/P8: synthetic ids distinct and strictly negative
    assert(sampled.filter(col("sample_id") >= 0).count() == 0)
    assert(sampled.select("sample_id").distinct().count() == n)
  }
}

class AccidentsCsvSpec extends SparkSpec {

  test("header scan + preprocess: date parse, hour split, coordinate casts, dropna") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_test").toString
    val csv = new java.io.File(dir, "acc.csv")
    val w = new java.io.PrintWriter(csv)
    w.println("DT_ACCDN,HEURE_ACCDN,LOC_LAT,LOC_LONG,OTHER")
    w.println("2017/03/05,14:30,45.51,-73.58,x")
    w.println("2017/12/31,0:15,45.62,-73.70,y")
    w.println(",9:00,45.0,-73.0,z") // missing date → dropped
    w.close()
    val parsed = AccidentsCsv.preprocess(AccidentsCsv.read(spark, csv.toString))
    val rows = parsed.orderBy("date").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[java.sql.Date]("date").toString == "2017-03-05")
    assert(rows(0).getAs[Int]("hour") == 14)
    assert(rows(0).getAs[Double]("loc_lat") == 45.51)
    assert(rows(1).getAs[Int]("hour") == 0)
    // synthetic ids are distinct
    assert(parsed.select("accident_id").distinct().count() == 2)
  }
}

class CachedTableSpec extends SparkSpec {
  test("computes once, then reads the parquet cache") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cache_test").toString + "/t.parquet"
    var computes = 0
    def compute = { computes += 1; Seq((1, "a"), (2, "b")).toDF("k", "v") }
    assert(CachedTable(spark, dir)(compute).count() == 2)
    assert(CachedTable(spark, dir)(compute).count() == 2)
    assert(computes == 1) // second call served from the cache
  }
}

class StreetTypesSpec extends SparkSpec {

  test("first-word keyword classification incl. case folding and no-match null") {
    val s = spark; import s.implicits._
    val got = Seq("Rue Sainte-Catherine", "croissant du Parc", "AUTOROUTE 40",
        "Île aux Tourtes", "Zigzag Way")
      .toDF("name")
      .select(StreetTypes.streetType(col("name"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("street", "crescent", "autoroute", "island", null))
  }
}
