package graft

import graft.operators.{Bootstrap, GroupRegression}
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {

  test("CI brackets the mean and is deterministic across runs") {
    val s = spark; import s.implicits._
    val df = (1 to 2000).map(i => (i.toLong, (i % 100).toLong * 10)).toDF("k", "cents")
    val r1 = Bootstrap.halfSampleCi(df, "k", "cents", b = 32).head()
    val r2 = Bootstrap.halfSampleCi(df, "k", "cents", b = 32).head()
    assert(r1 == r2, "hash replicates must be run-to-run identical")
    assert(r1.getAs[Long]("n_replicates") == 32L)
    val (mean, lo, hi) = (r1.getAs[Double]("mean_cents"),
      r1.getAs[Double]("ci_lo_cents"), r1.getAs[Double]("ci_hi_cents"))
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] must bracket mean $mean")
    assert(hi - lo < mean, "half-sample CI should be tight on 2000 uniform rows")
  }

  test("all replicates ride one aggregate — no join, no explode of the fact") {
    val s = spark; import s.implicits._
    val df = (1 to 100).map(i => (i.toLong, 10L)).toDF("k", "cents")
    val p = Bootstrap.halfSampleCi(df, "k", "cents", b = 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "bootstrap must not join the fact table:\n" + p)
  }
}

class GroupRegressionSpec extends SparkSpec {

  test("recovers an exact linear relationship with r2 = 1") {
    val s = spark; import s.implicits._
    // y = 300 + 7x exactly
    val df = (1 to 50).map(i => ("g", i.toLong, 300L + 7L * i)).toDF("grp", "x", "y")
    val r = GroupRegression.ols(df, "grp", "x", "y").head()
    assert(r.getAs[Double]("slope") == 7.0)
    assert(r.getAs[Double]("intercept") == 300.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("noisy groups: slope between the extremes, 0 < r2 < 1, per group") {
    val s = spark; import s.implicits._
    val df = (1 to 100).map { i =>
      val grp = if (i % 2 == 0) "a" else "b"
      // slope 5 with deterministic ±200 noise
      (grp, i.toLong, 5L * i + (if (i % 3 == 0) 200L else -200L))
    }.toDF("grp", "x", "y")
    val rows = GroupRegression.ols(df, "grp", "x", "y").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("slope") - 5.0) < 3.0)
      val r2 = r.getAs[Double]("r2")
      assert(r2 > 0 && r2 < 1)
    }
  }
}
