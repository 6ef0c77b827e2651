package graft

import graft.operators.{KmvAggregator, KmvSketch}
import org.apache.spark.sql.functions._

class KmvAggregatorSpec extends SparkSpec {

  test("UDAF path matches the window-based sketch exactly, group by group") {
    val s = spark; import s.implicits._
    val df = (1 to 3000).map(i => (s"g${i % 3}", (i * 17 % 997).toLong))
      .toDF("grp", "key")
    val sketch = udaf(new KmvAggregator(64))
    val viaUdaf = df.groupBy(col("grp")).agg(sketch(col("key")).as("kmv"))
      .select(col("grp"), col("kmv.m"), col("kmv.hk"), round(col("kmv.est"), 2))
      .as[(String, Long, Long, Double)].collect().toSet
    val viaWindow = KmvSketch.distinctEstimate(df, "grp", "key", k = 64)
      .select(col("grp"), col("est")).as[(String, Double)].collect().toMap
    assert(viaUdaf.size == 3)
    viaUdaf.foreach { case (g, m, hk, est) =>
      assert(est == viaWindow(g), s"UDAF and window estimates diverge for $g")
      assert(m == 64L && hk > 0L)
    }
  }

  test("merge is partitioning-invariant and small groups are exact") {
    val s = spark; import s.implicits._
    val df = (1 to 500).map(i => ("g", (i % 40).toLong)).toDF("grp", "key")
    val sketch = udaf(new KmvAggregator(64))
    val results = Seq(1, 7, 32).map { parts =>
      df.repartition(parts).groupBy(col("grp")).agg(sketch(col("key")).as("kmv"))
        .select(col("kmv.m"), col("kmv.est")).as[(Long, Double)].head()
    }
    assert(results.distinct.size == 1, s"partitioning changed the sketch: $results")
    assert(results.head == ((40L, 40.0)), "below-k group must be exact")
  }

  test("the sketch serves as streaming aggregation state, converging across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val sketch = udaf(new KmvAggregator(64))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("grp", "key")
      .groupBy(col("grp")).agg(sketch(col("key")).as("kmv"))
      .select(col("grp"), col("kmv.m"), col("kmv.est"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      mem.addData((1 to 20).map(i => ("g", i.toLong)): _*)
      q.processAllAvailable()
      mem.addData((10 to 30).map(i => ("g", i.toLong)): _*) // overlap dedups in-state
      q.processAllAvailable()
      val r = s.table("kmv_stream").as[(String, Long, Double)].head()
      assert(r == (("g", 30L, 30.0)),
        s"streamed sketch must equal the exact 30 distinct keys, got $r")
    } finally q.stop()
  }
}
