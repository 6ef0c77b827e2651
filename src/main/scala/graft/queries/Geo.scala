package graft.queries

import graft.Tables
import graft.functions.{DateFeatures, GeoFunctions, SolarFeatures}
import graft.operators.{DensifyMatch, IdwInterpolation, NearestMatch, ZOrder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial + calendar + solar feature coverage (SURVEY §2.8 F1/F3/F7/F8,
  * §3.1 matching, weather IDW §2.4 A2). Coordinates are derived
  * deterministically from integer keys (clustered around Montréal) so the
  * DuckDB oracle can mirror the exact double-precision formulas.
  */
object Geo {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  // Synthetic clustered coordinates (SQL + Column in lockstep).
  private def custLatSql = "(45.0 + (c_custkey % 100) / 100.0)"
  private def custLonSql = "(-74.0 + (c_custkey % 89) / 89.0)"
  private val custLat: Column = lit(45.0) + (col("c_custkey") % 100) / 100.0
  private val custLon: Column = lit(-74.0) + (col("c_custkey") % 89) / 89.0
  private def suppLatSql = "(45.0 + (s_suppkey % 97) / 97.0)"
  private def suppLonSql = "(-74.0 + (s_suppkey % 83) / 83.0)"
  private val suppLat: Column = lit(45.0) + (col("s_suppkey") % 97) / 97.0
  private val suppLon: Column = lit(-74.0) + (col("s_suppkey") % 83) / 83.0

  /** Haversine metres in DuckDB SQL — must mirror GeoFunctions exactly
    * (including the greatest(1 - inter, 0) NaN clamp).
    */
  private def haversineSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"""(atan2(sqrt(pow(sin(radians($lat1 - ($lat2)) / 2), 2)
       |           + pow(sin(radians($lon1 - ($lon2)) / 2), 2)
       |             * cos(radians($lat1)) * cos(radians($lat2))),
       |      sqrt(greatest(1.0 - (pow(sin(radians($lat1 - ($lat2)) / 2), 2)
       |           + pow(sin(radians($lon1 - ($lon2)) / 2), 2)
       |             * cos(radians($lat1)) * cos(radians($lat2))), 0.0)))
       | * ${2 * GeoFunctions.EarthRadiusM})""".stripMargin

  val queries: Seq[Q] = Seq(

    // The SQL front door: the same engine primitives reached through
    // spark.sql(...) and the GraftExtensions-injected FunctionRegistry
    // entries (graft_haversine_m / graft_dot / graft_hamming64) — proves
    // a SQL user gets the identical codegen'd expressions as the
    // DataFrame API. D-suffixed literals keep Spark SQL in double
    // arithmetic (bare 45.0 parses as DECIMAL there, unlike the oracle).
    Q("q_sql_registry_functions",
      s"""SELECT c_custkey,
         |       round(${haversineSql(custLatSql, custLonSql, "45.508", "-73.587")}, 1)
         |         AS dist_m,
         |       round(list_dot_product([CAST(c_acctbal AS DOUBLE), CAST(1.0 AS DOUBLE)],
         |                              [CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)]), 2) AS dot_v,
         |       cast(bit_count(xor(c_custkey, CAST(c_nationkey AS BIGINT))) AS int) AS hamm
         |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("customer_sql_v")
      s.sql(
        """SELECT c_custkey,
          |       round(graft_haversine_m(45.0D + (c_custkey % 100) / 100.0D,
          |                               -74.0D + (c_custkey % 89) / 89.0D,
          |                               45.508D, -73.587D), 1) AS dist_m,
          |       round(graft_dot(array(CAST(c_acctbal AS DOUBLE), 1.0D),
          |                       array(1.0D, 2.0D)), 2) AS dot_v,
          |       cast(graft_hamming64(c_custkey, CAST(c_nationkey AS BIGINT)) AS int) AS hamm
          |FROM customer_sql_v ORDER BY c_custkey""".stripMargin)
    },

    // F3 haversine as a pure projection (codegen'd, no UDF).
    Q("q_geo_haversine_to_center",
      s"""SELECT c_custkey,
         |       round(${haversineSql(custLatSql, custLonSql, "45.508", "-73.587")}, 1)
         |         AS dist_m
         |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          round(GeoFunctions.haversineMeters(custLat, custLon, lit(45.508), lit(-73.587)), 1)
            .as("dist_m"))
        .orderBy(col("c_custkey"))
    },

    // Native geofence: ray-casting point-in-polygon as a codegen'd
    // Catalyst expression (vertices ride a codegen reference object —
    // see expressions/PointInPolygon). The oracle unrolls the same
    // even-odd crossing terms edge by edge with the IDENTICAL float
    // formula, so the booleans match point for point.
    Q("q_geo_point_in_polygon",
      """WITH p AS (SELECT c_custkey,
        |                  (c_custkey % 100) / 10.0 AS x,
        |                  ((c_custkey * 7) % 100) / 10.0 AS y
        |           FROM customer),
        |f AS (SELECT c_custkey,
        |             (((CASE WHEN ((2 > y) != (6 > y)) AND (x < (1 - 2) * (y - 2) / (6 - 2) + 2) THEN 1 ELSE 0 END)
        |             + (CASE WHEN ((3 > y) != (2 > y)) AND (x < (2 - 8) * (y - 3) / (2 - 3) + 8) THEN 1 ELSE 0 END)
        |             + (CASE WHEN ((8 > y) != (3 > y)) AND (x < (8 - 7) * (y - 8) / (3 - 8) + 7) THEN 1 ELSE 0 END)
        |             + (CASE WHEN ((9 > y) != (8 > y)) AND (x < (7 - 4) * (y - 9) / (8 - 9) + 4) THEN 1 ELSE 0 END)
        |             + (CASE WHEN ((6 > y) != (9 > y)) AND (x < (4 - 1) * (y - 6) / (9 - 6) + 1) THEN 1 ELSE 0 END)
        |             ) % 2) = 1 AS inside
        |      FROM p)
        |SELECT cast(count(*) AS bigint) AS n_points,
        |       cast(sum(CASE WHEN inside THEN 1 ELSE 0 END) AS bigint) AS n_inside,
        |       cast(sum(CASE WHEN inside THEN c_custkey ELSE 0 END) AS bigint) AS key_inside
        |FROM f""".stripMargin) { (s, dir) =>
      val pentagon = Seq(2.0, 2.0, 8.0, 3.0, 7.0, 8.0, 4.0, 9.0, 1.0, 6.0)
      t(s, dir, "customer")
        .select(col("c_custkey"),
          ((col("c_custkey") % 100) / lit(10.0)).as("x"),
          (((col("c_custkey") * 7) % 100) / lit(10.0)).as("y"))
        .withColumn("inside",
          GeoFunctions.pointInPolygon(col("x"), col("y"), pentagon))
        .agg(count(lit(1)).as("n_points"),
          sum(when(col("inside"), 1L).otherwise(0L)).as("n_inside"),
          sum(when(col("inside"), col("c_custkey")).otherwise(0L)).as("key_inside"))
    },

    // §3.1 geo kNN matching via the grid-bucketed equi-join (the 100 TB
    // path — no cross join); oracle is the exhaustive cross-join + rank.
    Q("q_geo_knn_match",
      s"""SELECT c_custkey, s_suppkey, dist_m, rk FROM (
         |  SELECT c_custkey, s_suppkey,
         |         round(${haversineSql("c_lat", "c_lon", "s_lat", "s_lon")}, 1) AS dist_m,
         |         row_number() OVER (PARTITION BY c_custkey
         |             ORDER BY ${haversineSql("c_lat", "c_lon", "s_lat", "s_lon")}, s_suppkey) AS rk
         |  FROM (SELECT c_custkey, $custLatSql AS c_lat, $custLonSql AS c_lon FROM customer)
         |  CROSS JOIN (SELECT s_suppkey, $suppLatSql AS s_lat, $suppLonSql AS s_lon FROM supplier)
         |) WHERE rk <= 2
         |ORDER BY c_custkey, rk""".stripMargin) { (s, dir) =>
      val left = t(s, dir, "customer")
        .select(col("c_custkey"), custLat.as("c_lat"), custLon.as("c_lon"))
      val right = t(s, dir, "supplier")
        .select(col("s_suppkey"), suppLat.as("s_lat"), suppLon.as("s_lon"))
      // cellDeg matched to data density: coordinates span 1°×1°, so 0.5°
      // cells degenerate to ~9 buckets (≈ a skewed cross join — the
      // round-1 bench's slowest query). 0.08° ≈ 6.2 km coverage radius
      // balances grid-join selectivity against the exhaustive phase-2
      // fallback for rows whose k-th neighbour exceeds coverage (0.05°
      // was selective but sent ~25% of rows to the fallback cross join;
      // 0.08° halves the query). Exact either way.
      // widenRounds = 2 (round 21 A/B, min-of-3 TimeQ): at this density
      // round 3 proves almost nothing the exhaustive residue can't
      // handle — 2.07 → 1.58 s. Execution-only (both phases are exact);
      // DensifyMatch callers keep the default 3 (the same A/B REGRESSED
      // q_geo_densify_rematch 2.07 → 2.34 s: its straggler set is
      // bigger, so the third grid round still pays for itself).
      NearestMatch.kNearest(left, right, k = 2,
          leftId = "c_custkey", rightId = "s_suppkey",
          latL = "c_lat", lonL = "c_lon", latR = "s_lat", lonR = "s_lon",
          cellDeg = 0.08, widenRounds = 2)
        .select(col("c_custkey"), col("s_suppkey"),
          round(col("distance_m"), 1).as("dist_m"), col("rk"))
        .orderBy(col("c_custkey"), col("rk"))
    },

    // A2/IDW: inverse-distance-squared interpolation of supplier acctbal
    // onto customer points within 30 km (reference weather IDW,
    // src/preprocess.py:360-398).
    Q("q_geo_idw_acctbal",
      s"""WITH pairs AS (
         |  SELECT c_custkey,
         |         ${haversineSql("c_lat", "c_lon", "s_lat", "s_lon")} AS d,
         |         s_acctbal
         |  FROM (SELECT c_custkey, $custLatSql AS c_lat, $custLonSql AS c_lon FROM customer)
         |  CROSS JOIN (SELECT s_suppkey, s_acctbal,
         |                     $suppLatSql AS s_lat, $suppLonSql AS s_lon FROM supplier)
         |  WHERE ${haversineSql("c_lat", "c_lon", "s_lat", "s_lon")} < 30000
         |)
         |SELECT c_custkey,
         |       round(sum(s_acctbal / pow(greatest(d, 1.0), 2))
         |             / sum(1.0 / pow(greatest(d, 1.0), 2)), 3) AS idw_acctbal,
         |       count(*) AS n_stations
         |FROM pairs GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), custLat.as("c_lat"), custLon.as("c_lon"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_acctbal"), suppLat.as("s_lat"), suppLon.as("s_lon"))
      val pairs = cust.crossJoin(broadcast(supp))
        .withColumn("distance_m",
          GeoFunctions.haversineMeters(col("c_lat"), col("c_lon"), col("s_lat"), col("s_lon")))
        .filter(col("distance_m") < 30000)
      // n_stations folds into the SAME aggregation pass — a separate
      // count + join re-ran the 15M-pair cross join + haversine subtree
      IdwInterpolation.interpolate(pairs, "c_custkey", "distance_m",
          Seq("s_acctbal"), extraAggs = Seq(count(lit(1)).as("n_stations")))
        .select(col("c_custkey"), round(col("s_acctbal"), 3).as("idw_acctbal"),
          col("n_stations"))
        .orderBy(col("c_custkey"))
    },

    // Space-filling-curve layout clustering: customers quantized to a
    // 256×256 cell grid, keyed by (a) the Morton interleaved-bit
    // z-value, (b) the HILBERT index (reflect+swap rotation per bit
    // level — the oracle replays the identical loop as a chained-CTE
    // unroll), cut into 50-row blocks (a stand-in for files/row-groups),
    // and the per-block cell bounding box measured — against the same
    // blocks under naive key order. Curve block boxes are compact in
    // BOTH dimensions (that is the pruning win the layout buys at
    // scale; Hilbert's are tighter still — ZOrderSpec asserts the
    // property); the window here only SIMULATES the layout for
    // measurement — the production write path is ZOrder.repartitionByZ
    // (repartitionByRange + sorted files), which needs no global window.
    // All-integer arithmetic after one deterministic quantization ⇒
    // exact oracle replay of both curves.
    Q("q_geo_zorder_layout", {
      val bits = 8
      val n = 1L << bits
      val zTerms = (0 until bits).map(i =>
        s"(((cx >> $i) & 1) << ${2 * i}) + (((cy >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      // the Hilbert xy→d loop unrolled to one CTE per bit level, highest
      // first — state (x_k, y_k, d_k) mirrors HilbertIndex.compute
      val hilbChain = (0 until bits).map { k =>
        val s = 1L << (bits - 1 - k)
        val (px, py, pd) = (s"x$k", s"y$k", s"d$k")
        s"""h${k + 1} AS (
           |  SELECT c_custkey,
           |    $pd + ${s * s} * xor(3 * (CASE WHEN ($px & $s) > 0 THEN 1 ELSE 0 END),
           |                         CASE WHEN ($py & $s) > 0 THEN 1 ELSE 0 END) AS d${k + 1},
           |    CASE WHEN ($py & $s) = 0
           |         THEN (CASE WHEN ($px & $s) > 0 THEN ${n - 1} - $py ELSE $py END)
           |         ELSE $px END AS x${k + 1},
           |    CASE WHEN ($py & $s) = 0
           |         THEN (CASE WHEN ($px & $s) > 0 THEN ${n - 1} - $px ELSE $px END)
           |         ELSE $py END AS y${k + 1}
           |  FROM h$k)""".stripMargin
      }.mkString(",\n")
      def cellSql(v: String, lo: Double, span: Double) =
        s"CAST(least(greatest(floor(($v - ($lo)) / $span * 256.0), 0.0), 255.0) AS BIGINT)"
      def blockSql(src: String, layout: String) =
        s"""SELECT '$layout' AS layout, CAST(floor((rn - 1) / 50.0) AS BIGINT) AS block,
           |       count(*) AS n_pts,
           |       max(cx) - min(cx) + 1 AS x_span, max(cy) - min(cy) + 1 AS y_span
           |FROM $src GROUP BY 1, 2""".stripMargin
      s"""WITH pts AS (
         |  SELECT c_custkey,
         |         ${cellSql(custLonSql, -74.0, 1.0)} AS cx,
         |         ${cellSql(custLatSql, 45.0, 1.0)} AS cy
         |  FROM customer),
         |h0 AS (SELECT c_custkey, cx AS x0, cy AS y0, 0 AS d0 FROM pts),
         |$hilbChain,
         |pz AS (SELECT p.*, $zTerms AS z, h.d$bits AS hv
         |       FROM pts p JOIN h$bits h USING (c_custkey)),
         |zb AS (SELECT *, row_number() OVER (ORDER BY z, c_custkey) AS rn FROM pz),
         |hb AS (SELECT *, row_number() OVER (ORDER BY hv, c_custkey) AS rn FROM pz),
         |kb AS (SELECT *, row_number() OVER (ORDER BY c_custkey) AS rn FROM pz),
         |zs AS (${blockSql("zb", "zorder")}),
         |hs AS (${blockSql("hb", "hilbert")}),
         |ks AS (${blockSql("kb", "keyorder")})
         |SELECT * FROM zs UNION ALL SELECT * FROM hs UNION ALL SELECT * FROM ks
         |ORDER BY layout, block""".stripMargin
    }) { (s, dir) =>
      val bits = 8
      val cells = t(s, dir, "customer")
        .select(col("c_custkey"),
          ZOrder.cellId(custLon, -74.0, -73.0, bits).as("cx"),
          ZOrder.cellId(custLat, 45.0, 46.0, bits).as("cy"))
        .withColumn("z", ZOrder.interleave(col("cx"), col("cy"), bits))
        .withColumn("hv", ZOrder.hilbert(col("cx"), col("cy"), bits))
      def blockStats(ord: Column, layout: String): DataFrame =
        cells
          .withColumn("rn", row_number().over(Window.orderBy(ord, col("c_custkey"))))
          .withColumn("block", floor((col("rn") - 1) / 50.0))
          .groupBy(col("block"))
          .agg(count(lit(1)).as("n_pts"),
            (max(col("cx")) - min(col("cx")) + 1).as("x_span"),
            (max(col("cy")) - min(col("cy")) + 1).as("y_span"))
          .withColumn("layout", lit(layout))
      blockStats(col("z"), "zorder")
        .unionByName(blockStats(col("hv"), "hilbert"))
        .unionByName(blockStats(col("c_custkey"), "keyorder"))
        .orderBy(col("layout"), col("block"))
    },

    Q("q_solar_elevation",
      s"""SELECT event_id,
         |       round(degrees(asin(greatest(least(
         |         sin(radians(-23.45 * cos((2 * pi() / 365) * (dayofyear(ts) + 10))))
         |           * sin(radians(45.0 + (user_id % 100) / 100.0))
         |         + cos(radians(-23.45 * cos((2 * pi() / 365) * (dayofyear(ts) + 10))))
         |           * cos(radians(45.0 + (user_id % 100) / 100.0))
         |           * cos(0.2618 * ((hour(ts) + 0.5
         |               + (4 * ((-74.0 + (user_id % 89) / 89.0) - 15 * (-5.0))
         |                  + (-7.655 * sin(dayofyear(ts) * (2 * pi() / 365))
         |                     + 9.873 * sin(dayofyear(ts) * (2 * pi() / 365) * 2 + 3.588))) / 60)
         |               - 12)), 1.0), -1.0))), 3) AS solar_elev
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val lat = lit(45.0) + (col("user_id") % 100) / 100.0
      val lon = lit(-74.0) + (col("user_id") % 89) / 89.0
      t(s, dir, "events")
        .select(col("event_id"),
          round(SolarFeatures.solarElevation(
            dayofyear(col("ts")), hour(col("ts")), lat, lon, lit(-5.0)), 3)
            .as("solar_elev"))
        .orderBy(col("event_id"))
    },

    // §3.1 densify-and-rematch (reference preprocess.py:99-221): streets
    // synthesized from suppliers (20 polylines, centers derived
    // arithmetically from the street id so the oracle replays them
    // bit-exactly), accidents from customers. The DuckDB oracle replays
    // ALL four stages — center preselect, nearest-point first match,
    // midpoint densification of straggler candidates, center-distance
    // final dedup — so hash equality proves the branch split and the
    // densified re-rank, not just the final assignment.
    Q("q_geo_densify_rematch", {
      val hvCt = haversineSql("a.a_lat", "a.a_lon", "c.ct_lat", "c.ct_lon")
      val hvPt = haversineSql("p.a_lat", "p.a_lon", "t.p_lat", "t.p_lon")
      val hvDn = haversineSql("sp.a_lat", "sp.a_lon", "d.p_lat", "d.p_lon")
      s"""WITH acc AS (
         |  SELECT c_custkey AS accident_id, $custLatSql AS a_lat, $custLonSql AS a_lon
         |  FROM customer),
         |pts0 AS (
         |  SELECT DISTINCT cast(s_suppkey % 20 AS int) AS street_id,
         |         $suppLatSql AS p_lat, $suppLonSql AS p_lon FROM supplier),
         |centers AS (
         |  SELECT DISTINCT street_id,
         |         45.3 + (street_id % 11) / 11.0 AS ct_lat,
         |         -73.9 + (street_id % 7) / 7.0 AS ct_lon FROM pts0),
         |pre AS (
         |  SELECT accident_id, street_id, a_lat, a_lon FROM (
         |    SELECT a.accident_id, c.street_id, a.a_lat, a.a_lon,
         |           row_number() OVER (PARTITION BY a.accident_id
         |             ORDER BY $hvCt, c.street_id) AS rk
         |    FROM acc a CROSS JOIN centers c) WHERE rk <= 3),
         |first AS (
         |  SELECT accident_id, street_id, a_lat, a_lon, d FROM (
         |    SELECT p.accident_id, p.street_id, p.a_lat, p.a_lon, $hvPt AS d,
         |           row_number() OVER (PARTITION BY p.accident_id
         |             ORDER BY $hvPt, p.street_id, t.p_lat, t.p_lon) AS rk
         |    FROM pre p JOIN pts0 t ON p.street_id = t.street_id) WHERE rk = 1),
         |correct AS (
         |  SELECT accident_id, street_id, false AS rematched FROM first WHERE d < 8000),
         |stragpre AS (
         |  SELECT p.accident_id, p.street_id, p.a_lat, p.a_lon FROM pre p
         |  JOIN (SELECT accident_id FROM first WHERE d >= 8000) s
         |    ON p.accident_id = s.accident_id),
         |stragpts AS (
         |  SELECT * FROM pts0
         |  WHERE street_id IN (SELECT DISTINCT street_id FROM stragpre)),
         |mids AS (
         |  SELECT street_id,
         |         avg(p_lat) OVER (PARTITION BY street_id ORDER BY p_lon, p_lat
         |           ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS p_lat,
         |         avg(p_lon) OVER (PARTITION BY street_id ORDER BY p_lon, p_lat
         |           ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS p_lon
         |  FROM stragpts),
         |dens AS (
         |  SELECT DISTINCT street_id, p_lat, p_lon FROM
         |    (SELECT * FROM mids UNION ALL SELECT * FROM stragpts)),
         |rematch AS (
         |  SELECT accident_id, street_id, true AS rematched FROM (
         |    SELECT sp.accident_id, sp.street_id,
         |           row_number() OVER (PARTITION BY sp.accident_id
         |             ORDER BY $hvDn, sp.street_id, d.p_lat, d.p_lon) AS rk
         |    FROM stragpre sp JOIN dens d ON sp.street_id = d.street_id) WHERE rk = 1),
         |matched AS (
         |  SELECT * FROM correct UNION ALL SELECT * FROM rematch)
         |SELECT accident_id, street_id, rematched FROM (
         |  SELECT m.accident_id, m.street_id, m.rematched,
         |         row_number() OVER (PARTITION BY m.accident_id
         |           ORDER BY $hvCt, m.street_id) AS rk
         |  FROM matched m JOIN centers c ON m.street_id = c.street_id
         |  JOIN acc a ON m.accident_id = a.accident_id) WHERE rk = 1
         |ORDER BY accident_id""".stripMargin
    }) { (s, dir) =>
      val accidents = t(s, dir, "customer")
        .select(col("c_custkey").as("accident_id"),
          custLat.as("loc_lat"), custLon.as("loc_long"))
      val sid = pmod(col("s_suppkey"), lit(20)).cast("int")
      val roadPoints = t(s, dir, "supplier").select(
        sid.as("street_id"),
        suppLat.as("coord_lat"), suppLon.as("coord_long"),
        (lit(45.3) + (sid % 11) / 11.0).as("center_lat"),
        (lit(-73.9) + (sid % 7) / 7.0).as("center_long"))
      // 20 synthetic streets ⇒ the center preselect takes the exhaustive
      // broadcast path (exact either way; the grid path is exercised at
      // density by q_geo_knn_match and DensifyMatchSpec)
      DensifyMatch.densifyAndRematch(accidents, roadPoints,
          kPreselect = 3, maxDistanceM = 8000.0, cellDeg = 0.3,
          preselectExhaustive = true)
        .orderBy(col("accident_id"))
    },

    // §3.1-3.2 end to end: the ACCIDENT pipeline as one replayed oracle
    // query — fixture accidents (customers) + road points (suppliers,
    // 20 streets) → exact nearest-road match → positive samples →
    // full-year negative grid → anti-join dedup → train-period
    // accident-count feature → date + solar + IDW features → per
    // (split, label, month) rollup. The DuckDB oracle replays EVERY
    // stage, so hash equality proves the whole composition (each stage
    // is also individually gated by its own query); the forest fit that
    // follows in production stays rows-only in q_ml_rf_train_metrics by
    // design. Float sums round at rollup (3/2/1 decimals) per the
    // engine-exactness discipline; counts are exact integers.
    Q("q_pipeline_accidents", {
      val hvM = haversineSql("a.a_lat", "a.a_lon", "r.p_lat", "r.p_lon")
      val hvL = haversineSql("min(p_lat)", "min(p_lon)", "max(p_lat)", "max(p_lon)")
      val hvI = haversineSql("f.loc_lat", "f.loc_long", "st.st_lat", "st.st_lon")
      s"""WITH acc AS (
         |  SELECT c_custkey AS accident_id,
         |         $custLatSql AS a_lat, $custLonSql AS a_lon,
         |         DATE '2017-01-01' + CAST(c_custkey % 365 AS INT) AS date,
         |         CAST(c_custkey % 24 AS INT) AS hour
         |  FROM customer),
         |roads AS (
         |  SELECT DISTINCT CAST(s_suppkey % 20 AS INT) AS street_id,
         |         $suppLatSql AS p_lat, $suppLonSql AS p_lon
         |  FROM supplier),
         |matched AS (
         |  SELECT accident_id, street_id, date, hour FROM (
         |    SELECT a.accident_id, r.street_id, a.date, a.hour,
         |           row_number() OVER (PARTITION BY a.accident_id
         |             ORDER BY $hvM, r.street_id) AS rk
         |    FROM acc a CROSS JOIN roads r) WHERE rk = 1),
         |feats AS (
         |  SELECT street_id, $hvL AS street_length,
         |         min(p_lat) AS loc_lat, min(p_lon) AS loc_long
         |  FROM roads GROUP BY street_id),
         |pos AS (
         |  SELECT m.street_id, m.date, m.hour, f.street_length,
         |         f.loc_lat, f.loc_long, CAST(1.0 AS DOUBLE) AS label
         |  FROM matched m JOIN feats f USING (street_id)),
         |grid AS (
         |  SELECT CAST(g.d AS DATE) AS date, CAST(h.h AS INT) AS hour
         |  FROM generate_series(DATE '2017-01-01', DATE '2017-12-31', INTERVAL 1 DAY) g(d)
         |  CROSS JOIN generate_series(0, 23) h(h)),
         |neg AS (
         |  SELECT f.street_id, g.date, g.hour, f.street_length,
         |         f.loc_lat, f.loc_long, CAST(0.0 AS DOUBLE) AS label
         |  FROM grid g CROSS JOIN feats f),
         |negdedup AS (
         |  SELECT n.* FROM neg n ANTI JOIN pos p USING (street_id, date, hour)),
         |allsamples AS (
         |  SELECT * FROM pos UNION ALL SELECT * FROM negdedup),
         |traincnt AS (
         |  SELECT street_id, count(*) AS accident_count FROM pos
         |  WHERE date < DATE '2017-07-01' GROUP BY 1),
         |withcnt AS (
         |  SELECT a.*, coalesce(t.accident_count, 0) AS accident_count
         |  FROM allsamples a LEFT JOIN traincnt t USING (street_id)),
         |stations AS (
         |  SELECT $suppLatSql AS st_lat, $suppLonSql AS st_lon,
         |         CAST(s_acctbal AS DOUBLE) AS val
         |  FROM supplier),
         |idw AS (
         |  SELECT street_id,
         |         round(sum(val / pow(greatest(d, 1.0), 2))
         |               / sum(1.0 / pow(greatest(d, 1.0), 2)), 3) AS idw_acctbal
         |  FROM (SELECT f.street_id, $hvI AS d, st.val
         |        FROM feats f CROSS JOIN stations st
         |        WHERE $hvI < 30000)
         |  GROUP BY street_id),
         |final AS (
         |  SELECT CASE WHEN w.date < DATE '2017-07-01' THEN 'train' ELSE 'test' END AS split,
         |         CAST(w.label AS INT) AS label, CAST(month(w.date) AS INT) AS m,
         |         w.street_id, w.street_length, w.accident_count,
         |         cos(w.hour * (2 * pi() / 24)) AS f_hour_cos,
         |         sin(dayofyear(w.date) * (2 * pi() / 365)) AS f_doy_sin,
         |         degrees(asin(greatest(least(
         |           sin(radians(-23.45 * cos((2 * pi() / 365) * (dayofyear(w.date) + 10))))
         |             * sin(radians(w.loc_lat))
         |           + cos(radians(-23.45 * cos((2 * pi() / 365) * (dayofyear(w.date) + 10))))
         |             * cos(radians(w.loc_lat))
         |             * cos(0.2618 * ((w.hour + 0.5
         |                 + (4 * (w.loc_long - 15 * (-5.0))
         |                    + (-7.655 * sin(dayofyear(w.date) * (2 * pi() / 365))
         |                       + 9.873 * sin(dayofyear(w.date) * (2 * pi() / 365) * 2 + 3.588))) / 60)
         |                 - 12)), 1.0), -1.0))) AS solar_elevation,
         |         coalesce(i.idw_acctbal, 0.0) AS idw_acctbal
         |  FROM withcnt w LEFT JOIN idw i USING (street_id))
         |SELECT split, label, m,
         |       count(*) AS n_samples,
         |       CAST(count(DISTINCT street_id) AS BIGINT) AS n_streets,
         |       CAST(sum(accident_count) AS BIGINT) AS sum_acc,
         |       round(sum(street_length), 1) AS len_sum,
         |       round(sum(f_hour_cos), 3) AS hour_cos_sum,
         |       round(sum(f_doy_sin), 3) AS doy_sin_sum,
         |       round(sum(solar_elevation), 2) AS solar_sum,
         |       round(sum(idw_acctbal), 1) AS idw_sum
         |FROM final GROUP BY 1, 2, 3
         |ORDER BY split, label, m""".stripMargin
    }) { (s, dir) =>
      import graft.pipeline.AccidentPipeline
      val accidents = t(s, dir, "customer").select(
        col("c_custkey").as("accident_id"),
        custLat.as("loc_lat"), custLon.as("loc_long"),
        date_add(to_date(lit("2017-01-01")), (col("c_custkey") % 365).cast("int")).as("date"),
        (col("c_custkey") % 24).cast("int").as("hour"))
      val roadPoints = t(s, dir, "supplier").select(
        pmod(col("s_suppkey"), lit(20)).cast("int").as("street_id"),
        suppLat.as("coord_lat"), suppLon.as("coord_long"))
      val matched = AccidentPipeline.matchAccidentsToRoads(accidents, roadPoints, cellDeg = 0.08, widenRounds = 2)
      // per-street features: length = span between the extreme points
      // (min/max of doubles are order-free exact, so the oracle replays
      // them bit-for-bit), representative location = the min point
      val roadFeats = roadPoints.groupBy(col("street_id")).agg(
          min(col("coord_lat")).as("mnlat"), min(col("coord_long")).as("mnlon"),
          max(col("coord_lat")).as("mxlat"), max(col("coord_long")).as("mxlon"))
        .select(col("street_id"),
          GeoFunctions.haversineMeters(col("mnlat"), col("mnlon"),
            col("mxlat"), col("mxlon")).as("street_length"),
          col("mnlat").as("loc_lat"), col("mnlon").as("loc_long"))
      val pos = AccidentPipeline.positiveSamples(matched, roadFeats)
      // fraction 1.0: the hash-sampled path is murmur3 (q_sample_negatives
      // covers it rows-exactly); the replayed pipeline keeps every slot
      val neg = AccidentPipeline.negativeSamples(s, roadFeats, Seq(2017), sampleFraction = 1.0)
      // single split-tagged pass (round 21): the old (train, test) pair
      // re-filtered + unioned below duplicated the WHOLE upstream plan
      // (kNN match, anti-join, feature stack) — see datasetTagged
      val tagged = AccidentPipeline.datasetTagged(pos, neg, splitDate = "2017-07-01")
      // IDW "weather" (reference src/preprocess.py:360-398): supplier
      // acctbal interpolated onto street locations within 30 km,
      // broadcast back per street (20 rows)
      val stations = t(s, dir, "supplier").select(
        suppLat.as("st_lat"), suppLon.as("st_lon"), col("s_acctbal").cast("double").as("val"))
      val cand = roadFeats.select(col("street_id"), col("loc_lat"), col("loc_long"))
        .crossJoin(stations)
        .withColumn("d", GeoFunctions.haversineMeters(col("loc_lat"), col("loc_long"),
          col("st_lat"), col("st_lon")))
        .filter(col("d") < 30000)
      val idw = IdwInterpolation.interpolate(cand, "street_id", "d", Seq("val"))
        .select(col("street_id"), round(col("val"), 3).as("idw_acctbal"))
      tagged.join(broadcast(idw), Seq("street_id"), "left_outer")
        .withColumn("idw_acctbal", coalesce(col("idw_acctbal"), lit(0.0)))
        .groupBy(col("split"), col("label").cast("int").as("label"),
          month(col("date")).as("m"))
        .agg(count(lit(1)).as("n_samples"),
          countDistinct(col("street_id")).as("n_streets"),
          sum(col("accident_count")).as("sum_acc"),
          round(sum(col("street_length")), 1).as("len_sum"),
          round(sum(col("f_hour_cos")), 3).as("hour_cos_sum"),
          round(sum(col("f_doy_sin")), 3).as("doy_sin_sum"),
          round(sum(col("solar_elevation")), 2).as("solar_sum"),
          round(sum(col("idw_acctbal")), 1).as("idw_sum"))
        .orderBy(col("split"), col("label"), col("m"))
    },

    // F1/F7 date parts + cyclic encodings (reference
    // src/preprocess.py:401-419), aggregated per (year, month, iso dow).
    Q("q_date_features",
      """SELECT cast(year(o_orderdate) AS int) AS o_year,
        |       cast(month(o_orderdate) AS int) AS o_month,
        |       cast(isodow(o_orderdate) AS int) AS o_isodow,
        |       count(*) AS n_orders,
        |       round(sum(cos(dayofyear(o_orderdate) * (2 * pi() / 365))), 4) AS doy_cos_sum,
        |       round(sum(sin(dayofyear(o_orderdate) * (2 * pi() / 365))), 4) AS doy_sin_sum
        |FROM orders GROUP BY 1, 2, 3
        |ORDER BY o_year, o_month, o_isodow""".stripMargin) { (s, dir) =>
      val d = col("o_orderdate")
      t(s, dir, "orders")
        .groupBy(
          year(d).as("o_year"), month(d).as("o_month"),
          DateFeatures.isoDayOfWeek(d).as("o_isodow"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(DateFeatures.cyclicCos(dayofyear(d), 365)), 4).as("doy_cos_sum"),
          round(sum(DateFeatures.cyclicSin(dayofyear(d), 365)), 4).as("doy_sin_sum"))
        .orderBy(col("o_year"), col("o_month"), col("o_isodow"))
    })
}
