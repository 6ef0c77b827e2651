package graft

import graft.operators.{EmbeddingProfile, Survival}
import org.apache.spark.sql.functions._

class EmbeddingProfileSpec extends SparkSpec {

  test("constant dimension has zero variance; spread dimension ranks first") {
    val s = spark; import s.implicits._
    // dim 0 constant 0.5; dim 1 alternates ±0.5; dim 2 small wiggle
    val emb = (1 to 40).map { i =>
      (i.toLong, Array(0.5f, if (i % 2 == 0) 0.5f else -0.5f,
        if (i % 2 == 0) 0.01f else -0.01f))
    }.toDF("vec_id", "embedding")
    val rows = EmbeddingProfile.topVarianceDims(emb, "embedding", k = 3).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 0), "variance order")
    assert(rows(0).getAs[Double]("variance") == 0.25)
    assert(rows(0).getAs[Double]("mean") == 0.0)
    assert(rows(2).getAs[Double]("variance") == 0.0)
    assert(rows(2).getAs[Double]("mean") == 0.5)
  }
}

class SurvivalSpec extends SparkSpec {

  test("textbook risk-set arithmetic with censoring") {
    val s = spark; import s.implicits._
    // 10 subjects: events at t=1 (2), t=3 (1); censored at t=2 (3), t=5 (4)
    val dur = (Seq.fill(2)((1L, 1)) ++ Seq.fill(3)((2L, 0)) ++
      Seq((3L, 1)) ++ Seq.fill(4)((5L, 0))).toDF("t", "event")
    val rows = Survival.nelsonAalen(dur, "t", "event").orderBy("t").collect()
    assert(rows.length == 2) // censor-only times emit no row
    // t=1: d=2, risk=10 → h=0.2 ; t=3: d=1, risk=10−2−3=5 → h=0.2 ; H=0.4
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(2) == 10L)
    assert(rows(0).getAs[Double]("hazard") == 0.2)
    assert(rows(1).getLong(0) == 3L && rows(1).getLong(2) == 5L)
    assert(rows(1).getAs[Double]("cum_hazard") == 0.4)
  }

  test("no censoring: cumulative hazard grows every event time") {
    val s = spark; import s.implicits._
    val dur = (1 to 5).map(i => (i.toLong, 1)).toDF("t", "event")
    val rows = Survival.nelsonAalen(dur, "t", "event").orderBy("t").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(2)).toSeq == Seq(5L, 4L, 3L, 2L, 1L))
    val cums = rows.map(_.getAs[Double]("cum_hazard"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a })
    assert(rows.last.getAs[Double]("hazard") == 1.0)
  }
}
