package graft

import graft.operators.{Conformal, Resample}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Split conformal (X158) and linear-interpolation resample (X159). */
class ConformalLerpSpec extends SparkSpec {

  import spark.implicits._

  test("conformal: qhat is the exact order statistic; coverage counts correctly") {
    // calibration residuals 1..9 (n=9); alpha=0.2 -> k=ceil(10*0.8)=8 -> qhat=8
    val cal = (1 to 9).map(i => (i.toDouble, 0.0, true))
    val ev = Seq((3.0, 0.0, false), (8.0, 0.0, false), (9.5, 0.0, false))
    val df = (cal ++ ev).toDF("y", "yhat", "cal")
    val r = Conformal.report(df, "y", "yhat", col("cal"), Seq(0.2)).collect()(0)
    assert(r.getAs[Long]("n_cal") === 9L)
    assert(r.getAs[Long]("k") === 8L)
    assert(r.getAs[Double]("qhat") === 8.0)
    // covered: 3.0 and 8.0 (<= 8), not 9.5 -> 2/3
    assert(r.getAs[Double]("coverage") === math.rint(2.0 / 3 * 1e6) / 1e6)
  }

  test("conformal: coverage on the fixture is near 1 - alpha") {
    val df = Tables.load(spark, TestSpark.sf0001, "lineitem").select(
      col("l_extendedprice").as("y"), (col("l_quantity") * 1000).as("yhat"),
      (col("l_orderkey") % 4 === 0).as("cal"))
    val rows = Conformal.report(df, "y", "yhat", col("cal"), Seq(0.1, 0.2))
      .collect().map(r => r.getAs[Double]("alpha") -> r.getAs[Double]("coverage")).toMap
    rows.foreach { case (a, cov) =>
      assert(math.abs(cov - (1 - a)) < 0.05, s"alpha=$a coverage=$cov")
    }
  }

  test("conformal: bracket search matches a brute-force sort on fixture residuals") {
    val df = Tables.load(spark, TestSpark.sf0001, "lineitem").select(
      col("l_extendedprice").as("y"), (col("l_quantity") * 1000).as("yhat"),
      (col("l_orderkey") % 4 === 0).as("cal"))
    val resid = df.filter(col("cal"))
      .select(abs(col("y") - col("yhat")).as("s"))
      .orderBy(col("s")).collect().map(_.getDouble(0))
    val n = resid.length
    val alphas = Seq(0.05, 0.1, 0.3, 0.5)
    val got = Conformal.report(df, "y", "yhat", col("cal"), alphas)
      .collect().map(r => r.getAs[Double]("alpha") -> r.getAs[Double]("qhat")).toMap
    alphas.foreach { a =>
      val k = math.ceil((n + 1) * (1 - a)).toInt
      val expect = math.rint(resid(k - 1) * 1e6) / 1e6
      assert(got(a) === expect, s"alpha=$a: exact order statistic")
    }
  }

  test("conformal: alpha below 1/(n+1) yields +inf qhat and full coverage") {
    // n_cal = 4: alpha = 0.1 < 1/5 -> k = ceil(5*0.9) = 5 > 4 -> qhat = +inf
    val cal = (1 to 4).map(i => (i.toDouble, 0.0, true))
    val ev = Seq((100.0, 0.0, false))
    val r = Conformal.report((cal ++ ev).toDF("y", "yhat", "cal"),
      "y", "yhat", col("cal"), Seq(0.1)).collect()(0)
    assert(r.getAs[Long]("k") === 5L)
    assert(r.getAs[Double]("qhat").isPosInfinity)
    assert(r.getAs[Double]("coverage") === 1.0, "everything falls inside an infinite interval")
  }

  test("conformal: all-tied residuals and an empty eval slice are handled") {
    val cal = (1 to 8).map(_ => (5.0, 0.0, true))
    val r = Conformal.report(cal.toDF("y", "yhat", "cal"),
      "y", "yhat", col("cal"), Seq(0.2)).collect()(0)
    assert(r.getAs[Double]("qhat") === 5.0, "tied bracket collapses to the tied value")
    assert(r.isNullAt(r.fieldIndex("coverage")), "no eval rows -> null coverage, not NaN")
  }

  test("lerp resample: interpolates on the line, clamps at the edges") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // events at t=3600s (v=10) and t=10800s (v=30); grid hours 1,2,3
    val ev = Seq((1L, ts(3600), 10.0), (1L, ts(10800), 30.0))
      .toDF("user_id", "ts", "value")
    val got = Resample.lerpHourly(ev, "user_id", "ts", "value")
      .collect().map(r => r.getAs[Long]("hr_us") / 3600000000L -> r.getAs[Double]("value"))
      .toMap
    assert(got === Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // grid point before the first event clamps to the first value
    val ev2 = Seq((2L, ts(3660), 50.0), (2L, ts(7200), 70.0))
      .toDF("user_id", "ts", "value")
    val got2 = Resample.lerpHourly(ev2, "user_id", "ts", "value")
      .collect().map(r => r.getAs[Long]("hr_us") / 3600000000L -> r.getAs[Double]("value"))
      .toMap
    assert(got2(1L) === 50.0, "pre-first grid point clamps")
    assert(got2(2L) === 70.0, "grid point at the last event hits it exactly")
  }

  test("lerp plan: one key shuffle feeds both carry windows") {
    val p = Resample.lerpHourly(Tables.load(spark, TestSpark.sf0001, "events"),
        "user_id", "ts", "value")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      "grid build + union may shuffle once each, never more:\n" + p)
  }
}
