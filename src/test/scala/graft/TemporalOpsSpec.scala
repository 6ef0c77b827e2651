package graft

import graft.operators.{RollingOrigin, Seasonal, WaterFill}
import org.apache.spark.sql.functions._

class RollingOriginSpec extends SparkSpec {

  test("folds expand monotonically and test windows never overlap training") {
    val s = spark; import s.implicits._
    // 20 days × 10 events/day, value 1.0 each
    val ev = (0 until 200).map { i =>
      (i.toLong, f"2024-01-${1 + i % 20}%02d 12:00:00", 1.0)
    }.toDF("id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val rows = RollingOrigin.folds(ev, "ts", "value", nFolds = 4, horizonDays = 3)
      .orderBy("fold").collect()
    assert(rows.length == 4)
    // span=19, trainable=16 → cuts 4, 8, 12, 16
    assert(rows.map(_.getAs[Int]("train_end_day")).toSeq == Seq(4, 8, 12, 16))
    val nTrain = rows.map(_.getAs[Long]("n_train")).toSeq
    assert(nTrain == Seq(50L, 90L, 130L, 170L), s"expanding train sets: $nTrain")
    // horizon 3 days × 10 events, fully inside the span for every fold
    assert(rows.forall(_.getAs[Long]("n_test") == 30L))
    assert(rows.forall(_.getAs[Long]("test_value_us") == 30000000L))
  }
}

class WaterFillSpec extends SparkSpec {

  test("small demands served whole, big ones level-capped, budget exhausted") {
    val s = spark; import s.implicits._
    val dem = Seq(("a", 10L), ("b", 20L), ("c", 100L), ("d", 200L)).toDF("src", "demand")
    // budget 90: a,b full (30); level = 60 div 2 = 30, rem 0 → c,d get 30
    val r = WaterFill.allocate(dem, "src", "demand", budget = 90L)
      .collect().map(x => x.getString(0) -> (x.getLong(2), x.getBoolean(3))).toMap
    assert(r == Map("a" -> (10L, true), "b" -> (20L, true),
      "c" -> (30L, false), "d" -> (30L, false)))
  }

  test("remainder goes to the smallest unserved sources; sum equals budget") {
    val s = spark; import s.implicits._
    val dem = Seq(("a", 5L), ("b", 50L), ("c", 60L), ("d", 70L)).toDF("src", "demand")
    // budget 51: a full (5); level = 46 div 3 = 15, rem 1 → b gets 16, c,d get 15
    val rows = WaterFill.allocate(dem, "src", "demand", budget = 51L).collect()
    val m = rows.map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(m == Map("a" -> 5L, "b" -> 16L, "c" -> 15L, "d" -> 15L))
    assert(m.values.sum == 51L)
  }

  test("budget above total demand serves everyone fully") {
    val s = spark; import s.implicits._
    val dem = Seq(("a", 7L), ("b", 9L)).toDF("src", "demand")
    val rows = WaterFill.allocate(dem, "src", "demand", budget = 100L).collect()
    assert(rows.forall(_.getBoolean(3)))
    assert(rows.map(_.getLong(2)).sum == 16L)
  }
}

class SeasonalSpec extends SparkSpec {

  test("a flat series decomposes to zero seasonal everywhere") {
    val s = spark; import s.implicits._
    val ev = (0 until 72).flatMap { h =>
      (1 to 5).map(i => (h.toLong * 5 + i, f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:30:00"))
    }.toDF("id", "ts_s").withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val rows = Seasonal.hourOfDayProfile(ev, "ts").collect()
    assert(rows.length == 24)
    assert(rows.forall(_.getAs[Double]("seasonal") == 0.0))
    assert(rows.forall(_.getAs[Double]("dispersion") == 0.0))
  }

  test("an hour-of-day spike shows up in its own bucket only") {
    val s = spark; import s.implicits._
    // 5/hour baseline over 3 days, +20 extra at hour 6
    val ev = (0 until 72).flatMap { h =>
      val extra = if (h % 24 == 6) 20 else 0
      (1 to 5 + extra).map(i => (h.toLong * 100 + i, f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:30:00"))
    }.toDF("id", "ts_s").withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val rows = Seasonal.hourOfDayProfile(ev, "ts").collect()
      .map(r => r.getAs[Int]("hod") -> r.getAs[Double]("seasonal")).toMap
    assert(rows(6) > 15.0, s"spike hour must dominate: ${rows(6)}")
    assert(rows.filter(_._1 != 6).values.forall(v => v < 0),
      "baseline hours sit below the spiky trend")
  }
}
