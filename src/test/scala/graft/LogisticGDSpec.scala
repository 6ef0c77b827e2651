package graft

import graft.ml.LogisticGD
import org.apache.spark.sql.functions._

/** Deterministic grid-floored logistic GD (X178). */
class LogisticGDSpec extends SparkSpec {

  import spark.implicits._

  private lazy val separable = {
    // y = 1 iff x1 > 0.5; clearly separable, pre-scaled features
    (1 to 200).map { i =>
      val x1 = (i % 100) / 100.0
      (if (x1 > 0.5) 1.0 else 0.0, x1, ((i * 7) % 100) / 100.0)
    }.toDF("y", "x1", "x2")
  }

  test("loss decreases every iteration and the signal feature dominates") {
    val out = LogisticGD.fit(separable, "y", Seq("x1", "x2"), lr = 2.0, iterations = 5)
      .orderBy($"iter").collect()
    val losses = out.map(_.getAs[Double]("mean_loss"))
    losses.sliding(2).foreach { case Array(a, b) => assert(b < a, s"loss must fall: ${losses.toSeq}") }
    val last = out.last
    assert(math.abs(last.getAs[Double]("w_x1")) > math.abs(last.getAs[Double]("w_x2")) * 2,
      "the separating feature carries the weight")
    assert(last.getAs[Double]("w_x1") > 0, "positive slope toward y=1")
  }

  test("the fit is bit-deterministic across runs and partitionings") {
    val a = LogisticGD.fit(separable, "y", Seq("x1", "x2"), lr = 2.0, iterations = 3)
      .collect().map(_.toSeq).toSeq
    val b = LogisticGD.fit(separable.repartition(7), "y", Seq("x1", "x2"),
        lr = 2.0, iterations = 3)
      .collect().map(_.toSeq).toSeq
    assert(a === b, "grid-floored gradients must be partitioning-independent")
  }

  test("iteration 1 from zero weights reports the 0.693 uniform loss") {
    val r = LogisticGD.fit(separable, "y", Seq("x1", "x2"), lr = 1.0, iterations = 1).head()
    assert(r.getAs[Double]("mean_loss") === math.rint(-math.log(0.5) * 1e6) / 1e6)
    assert(r.getAs[Long]("n") === 200L)
  }
}
