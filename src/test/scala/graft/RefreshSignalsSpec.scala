package graft

import graft.operators.{Autocorrelation, Funnel, IncrementalAgg, LinkPrediction, ManifestPrune}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Delete-aware view refresh (X169), manifest pruning audit (X168),
  * windowed funnel (X171), link prediction (X170), ACF (X172).
  */
class RefreshSignalsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("retract equals full recompute; extremum keys recompute, others adjust") {
    val all = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 5L), (2L, 7L), (3L, 9L))
      .toDF("k", "v")
    // delete: key 1 loses its max (30), key 2 loses a middle row (5 = its min!),
    // key 3 deleted entirely
    val isDel = (col("k") === 1 && col("v") === 30L) ||
      (col("k") === 2 && col("v") === 5L) || (col("k") === 3)
    val base = IncrementalAgg.partial(all, "k", "v")
    val got = IncrementalAgg.retract(base, all.filter(isDel), all.filter(!isDel), "k", "v")
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expect = IncrementalAgg.partial(all.filter(!isDel), "k", "v")
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expect.toSeq)
    assert(!got.exists(_._1 == 3L), "fully-deleted key leaves the view")
    assert(got.find(_._1 == 1L).get === ((1L, 2L, 30L, 10L, 20L)))
  }

  test("manifest audit: value-clustered files skip, straddling files scan") {
    val rows = Seq((0L, 10L), (1L, 15L), (2L, 100L), (3L, 110L), (4L, 500L), (5L, 510L))
      .toDF("id", "v")
    val out = ManifestPrune.rangeAudit(rows, expr("id div 2"), "v", 90, 200)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(4), r.getLong(5))).toMap
    assert(out(0L) === ((false, 0L)), "file [10,15] skipped")
    assert(out(1L) === ((true, 2L)), "file [100,110] scanned, both hit")
    assert(out(2L) === ((false, 0L)), "file [500,510] skipped")
  }

  test("windowed funnel drops conversions outside the gap bound") {
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(100)), (1L, "purchase", ts(150)),
      (2L, "view", ts(0)), (2L, "click", ts(5000)) // click far beyond the 1000s bound
    ).toDF("user_id", "event_type", "ts")
    val bounded = Funnel.conversionWithin(ev, Seq("view", "click", "purchase"),
        maxGapUs = 1000L * 1000000L)
      .collect().map(r => r.getLong(0) -> (r.isNullAt(2), r.isNullAt(3))).toMap
    assert(bounded(1L) === ((false, false)), "in-window chain converts fully")
    assert(bounded(2L) === ((true, true)), "late click does not qualify")
    // the unbounded funnel DOES count user 2's click
    val free = Funnel.conversion(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(free(2L) === false)
  }

  test("link prediction: square graph predicts exactly the two diagonals") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = LinkPrediction.jaccardTopK(edges, k = 10, maxCenterDegree = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getAs[Double]("jaccard"))).toMap
    // 1-3 share {2,4}; deg 2+2, jaccard = 2/(2+2-2) = 1; same for 2-4
    assert(out.keySet === Set((1L, 3L), (2L, 4L)))
    assert(out.values.forall(_ == ((2L, 1.0))), s"got $out")
  }

  test("ACF: alternating series gives r(1) = -1 and r(2) = +1") {
    val ev = (0 until 40).map(i =>
      (1L, ts(i * 10), if (i % 2 == 0) 1.0 else -1.0)).toDF("user_id", "ts", "value")
    val out = Autocorrelation.acf(ev, "user_id", "ts", "value", maxLag = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getAs[Double]("r"))).toMap
    assert(out(1)._1 === 39L)
    assert(math.abs(out(1)._2 + 1.0) < 1e-6, s"lag-1 anticorrelated: $out")
    assert(math.abs(out(2)._2 - 1.0) < 1e-6, s"lag-2 correlated: $out")
    // constant series: undefined (null) r, not 0
    val const = (0 until 10).map(i => (1L, ts(i * 10), 5.0)).toDF("user_id", "ts", "value")
    val cr = Autocorrelation.acf(const, "user_id", "ts", "value", maxLag = 1).head()
    assert(cr.isNullAt(cr.fieldIndex("r")))
  }
}
