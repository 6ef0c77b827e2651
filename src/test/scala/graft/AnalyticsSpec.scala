package graft

import graft.operators.{CdcMerge, Concentration, GridCluster, Resample, Skyline, Winsorizer}
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {

  test("frontier keeps exactly the non-dominated points, duplicates together") {
    val s = spark; import s.implicits._
    // frontier (minimize x, maximize y): (1,5), (2,7) dup ×2, (4,9)
    val pts = Seq(
      (1L, 1.0, 5.0), (2L, 2.0, 7.0), (3L, 2.0, 7.0), (4L, 4.0, 9.0),
      (5L, 3.0, 6.0),  // dominated by (2,7)
      (6L, 2.0, 5.0),  // dominated by (2,7) on y at equal x
      (7L, 5.0, 9.0)   // dominated by (4,9) on x at equal y
    ).toDF("id", "x", "y")
    val got = Skyline.frontier2d(pts, "id", "x", "y", bucketWidth = 1.0)
      .select("sk_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("bucket prune is safe at any width (brute-force cross-check)") {
    val s = spark; import s.implicits._
    val pts = (1 to 200).map { i =>
      (i.toLong, (i * 37 % 101).toDouble, (i * 53 % 97).toDouble)
    }.toDF("id", "x", "y")
    val rows = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y)
      }
    }.map(_._1).sorted.toSeq
    for (w <- Seq(0.5, 7.0, 1000.0)) {
      val got = Skyline.frontier2d(pts, "id", "x", "y", bucketWidth = w)
        .select("sk_id").as[Long].collect().sorted.toSeq
      assert(got == expected, s"bucketWidth=$w")
    }
  }
}

class WinsorizerSpec extends SparkSpec {

  test("clips to the group percentiles; interior values untouched") {
    val s = spark; import s.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val w = Winsorizer.winsorize(df, "grp", "v", pLo = 0.05, pHi = 0.95)
    // exact percentiles of 1..100: p05 = 5.95, p95 = 95.05
    val r = w.agg(min("w_lo"), min("w_hi"), min("v_w"), max("v_w"))
      .head()
    assert(r.getDouble(0) == 5.95 && r.getDouble(1) == 95.05)
    assert(r.getDouble(2) == 5.95 && r.getDouble(3) == 95.05)
    val untouched = w.filter(col("v") >= col("w_lo") && col("v") <= col("w_hi"))
      .filter(col("v") =!= col("v_w")).count()
    assert(untouched == 0L)
  }
}

class ConcentrationSpec extends SparkSpec {

  test("uniform distribution → gini 0; extreme concentration → gini near 1") {
    val s = spark; import s.implicits._
    val uniform = (1 to 100).map(i => (i.toLong, 7L)).toDF("id", "units")
    val gUni = Concentration.lorenzGini(uniform, "id", "units", 4)
      .select("gini").head().getDouble(0)
    assert(math.abs(gUni) < 1e-9)
    val extreme = ((1 to 99).map(i => (i.toLong, 0L)) :+ (100L, 1000L))
      .toDF("id", "units")
    val gExt = Concentration.lorenzGini(extreme, "id", "units", 4)
      .select("gini").head().getDouble(0)
    assert(gExt == 0.99)
  }

  test("cumulative share reaches 1.0 in the last bucket") {
    val s = spark; import s.implicits._
    val df = (1 to 40).map(i => (i.toLong, i.toLong * 3)).toDF("id", "units")
    val rows = Concentration.lorenzGini(df, "id", "units", 10)
      .orderBy("bucket").collect()
    assert(rows.length == 10)
    assert(rows.last.getAs[Double]("cum_share") == 1.0)
    assert(rows.map(_.getAs[Long]("n")).sum == 40L)
  }
}

class CdcMergeSpec extends SparkSpec {

  test("latest op wins; deletes remove; untouched base rows pass through") {
    val s = spark; import s.implicits._
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val changes = Seq(
      (1L, 5L, "U", 11L), (1L, 9L, "U", 12L), // key 1 → 12
      (2L, 4L, "D", 0L),                      // key 2 deleted
      (4L, 2L, "U", 40L),                     // new key inserted
      (5L, 1L, "U", 50L), (5L, 3L, "D", 0L)   // inserted then deleted
    ).toDF("k", "seq", "op", "v")
    val got = CdcMerge.applyChanges(base, changes, "k", "seq", "op")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 12L), (3L, 30L), (4L, 40L)))
  }

  test("resolution is one window over one shuffle — no join in the plan") {
    val s = spark; import s.implicits._
    val base = Seq((1L, 10L)).toDF("k", "v")
    val changes = Seq((1L, 5L, "U", 11L)).toDF("k", "seq", "op", "v")
    val p = CdcMerge.applyChanges(base, changes, "k", "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "CDC merge must not join:\n" + p)
  }
}

class ResampleSpec extends SparkSpec {

  test("grid spans first..last hour and forward-fills gaps") {
    val s = spark; import s.implicits._
    val ev = Seq(
      (1L, "2024-01-01 00:10:00", 1L, 10.0),
      (1L, "2024-01-01 00:40:00", 2L, 20.0), // later in same hour wins
      (1L, "2024-01-01 03:05:00", 3L, 30.0)  // hours 1,2 fill with 20.0
    ).toDF("user_id", "ts_s", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = Resample.locfHourly(ev, "user_id", "ts", "value", "event_id")
      .orderBy("hr").select("value").as[Double].collect().toSeq
    assert(got == Seq(20.0, 20.0, 20.0, 30.0))
  }

  test("intra-hour ties resolve by (ts, tie) descending") {
    val s = spark; import s.implicits._
    val ev = Seq(
      (1L, "2024-01-01 00:30:00", 5L, 1.0),
      (1L, "2024-01-01 00:30:00", 9L, 2.0) // same ts → higher event_id wins
    ).toDF("user_id", "ts_s", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = Resample.locfHourly(ev, "user_id", "ts", "value", "event_id")
      .select("value").as[Double].collect().toSeq
    assert(got == Seq(2.0))
  }
}

class GridClusterSpec extends SparkSpec {

  test("two dense blobs cluster separately; sparse noise drops; touching cells merge") {
    val s = spark; import s.implicits._
    // blob A: cells (0,0)+(0,1) — adjacent, must merge; blob B: cell (5,5);
    // noise: one point per far-away cell, below minPts
    val pts = (
      (1 to 30).map(i => (0.05, 0.02 + (i % 2) * 0.1)) ++ // 15 in (0,0), 15 in (0,1)
        (1 to 20).map(_ => (0.55, 0.55)) ++
        Seq((9.0, 9.0), (8.0, 3.0))
      ).toDF("x", "y")
    val got = GridCluster.clusters(pts, "x", "y", cellSize = 0.1, minPts = 10L)
      .orderBy("cx", "cy").collect()
    assert(got.length == 3)
    val clusters = got.map(_.getAs[Long]("cluster_id")).distinct
    assert(clusters.length == 2, s"expected A-merged + B: ${got.mkString(";")}")
    // the two A-cells share one label
    assert(got(0).getAs[Long]("cluster_id") == got(1).getAs[Long]("cluster_id"))
  }

  test("adjacency is equi-join only — no cartesian in the plan") {
    val s = spark; import s.implicits._
    val pts = (1 to 20).map(_ => (0.05, 0.05)).toDF("x", "y")
    val p = GridCluster.clusters(pts, "x", "y", cellSize = 0.1, minPts = 5L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "grid adjacency must stay equi-joined:\n" + p)
  }
}
