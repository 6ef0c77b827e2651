package graft

import graft.operators.ChangePoint
import org.apache.spark.sql.functions._

class ChangePointSpec extends SparkSpec {

  test("a clean level shift peaks the CUSUM at the last low day") {
    val s = spark; import s.implicits._
    // 10 days at 5/day, then 10 days at 15/day → break after day 10
    val ev = (0 until 20).flatMap { d =>
      val n = if (d < 10) 5 else 15
      (1 to n).map(i => (d * 100 + i, f"2024-01-${d + 1}%02d 10:00:00"))
    }.toDF("id", "ts_s").withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = ChangePoint.cusumDaily(ev, "ts").head()
    assert(r.getAs[Long]("n_days") == 20L && r.getAs[Long]("total") == 200L)
    assert(r.getAs[java.sql.Date]("cp_day").toString == "2024-01-10")
    // C_10 = 10·(5·20 − 200) = −1000 → |C| = 1000; stat = 1000/(20·200) = 0.25
    assert(r.getAs[Long]("c_scaled") == 1000L)
    assert(r.getAs[Double]("stat") == 0.25)
  }

  test("a flat series has zero statistic and ties to the first day") {
    val s = spark; import s.implicits._
    val ev = (0 until 10).flatMap { d =>
      (1 to 7).map(i => (d * 10 + i, f"2024-02-${d + 1}%02d 09:00:00"))
    }.toDF("id", "ts_s").withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = ChangePoint.cusumDaily(ev, "ts").head()
    assert(r.getAs[Long]("c_scaled") == 0L)
    assert(r.getAs[Double]("stat") == 0.0)
    assert(r.getAs[java.sql.Date]("cp_day").toString == "2024-02-01")
  }
}
