package graft

import org.apache.spark.sql.functions._

class SequenceNgramsSpec extends SparkSpec {
  test("planted trigram dominates; sequence order is (ts, event_id)") {
    val s = spark; import s.implicits._
    // user 1 replays view->cart->buy 3 times; user 2 contributes noise
    val rows = (0 until 9).map(i =>
      (i.toLong, 1L, Seq("view", "cart", "buy")(i % 3),
        java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"))) ++
      Seq((100L, 2L, "view", java.sql.Timestamp.valueOf("2024-01-01 01:00:00")),
        (101L, 2L, "view", java.sql.Timestamp.valueOf("2024-01-01 01:01:00")))
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts")
    val top = graft.operators.SequenceNgrams.topNgrams(ev, n = 3, k = 3).collect()
    val head = top.head
    assert((head.getString(0), head.getString(1), head.getString(2)) ==
      (("view", "cart", "buy")), s"got ${top.toSeq}")
    assert(head.getAs[Long]("n") == 3L)
    assert(head.getAs[Int]("rk") == 1)
    // user 2 has only 2 events: no trigram crosses users
    assert(!top.exists(r => r.getString(0) == "view" && r.getString(1) == "view"
      && r.getString(2) == "view"))
  }
}

class CompactionPlanSpec extends SparkSpec {
  test("next-fit prefix-sum bins: boundaries, oversized units, totals") {
    val s = spark; import s.implicits._
    // sizes 60,60,60 at target 100: cum_before 0,60,120 -> bins 0,0,1;
    // then a 250 oversize lands at cum_before 180 -> bin 1 (next-fit
    // never splits), then 10 at cum_before 430 -> bin 4
    val units = Seq((1L, 60L), (2L, 60L), (3L, 60L), (4L, 250L), (5L, 10L))
      .toDF("file_id", "size")
    val plan = graft.operators.CompactionPlan.plan(units, targetSize = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(plan == Map(0L -> ((2L, 120L)), 1L -> ((2L, 310L)), 4L -> ((1L, 10L))),
      s"got $plan")
  }
}

class KCoreSpec extends SparkSpec {
  test("pendant chain peels round by round; the clique survives") {
    val s = spark; import s.implicits._
    // K4 clique (each degree 3) + chain 4-5-6: 6 peels in round 1
    // (deg 1 < 2), 5 in round 2 (its only other neighbor 4 keeps it at
    // deg 1 after 6 leaves... deg(5)=1 after round 1), then nothing
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val out = graft.operators.KCore.peel(edges, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out(6L)._1 == 1 && out(5L)._1 == 2 && out(4L)._1 == 3, s"got $out")
    assert(Seq(0L, 1L, 2L, 3L).forall(out(_)._1 == 0), s"clique must survive: $out")
    assert(out(3L)._2 == 3L, "3 keeps its clique degree once 4 is gone")
    assert(out(0L)._2 == 3L)
  }

  test("degree-delta peel: bounded job count — one full-degree pass, node-sized rounds") {
    val s = spark; import s.implicits._
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def jobsFor(rounds: Int): Int = {
      jobs.set(0)
      s.sparkContext.addSparkListener(listener)
      try {
        graft.operators.KCore.peel(edges, k = 2, rounds = rounds)
        // listener events are posted asynchronously
        Thread.sleep(1500)
      } finally s.sparkContext.removeSparkListener(listener)
      jobs.get
    }
    val j3 = jobsFor(3)
    val j5 = jobsFor(5)
    println(s"KCORE_JOBS rounds=3: $j3, rounds=5: $j5")
    // actions: 1 initial degree materialize + r per-round degree
    // materializes + 1 final checkpoint; AQE splits each action into a
    // handful of stage-materialization jobs. The pin: the marginal cost
    // of a round is a FIXED handful of node-sized jobs (the old shape
    // added edge-list re-materializations on top, and a regression back
    // to per-round full-degree scans would push the marginal count up)
    assert(j3 <= 32, s"peel(rounds=3) ran $j3 jobs — per-round work regressed")
    assert(j5 - j3 <= 14, s"marginal rounds cost ${j5 - j3} jobs over two rounds")
  }
}

class PersonalizedPageRankSpec extends SparkSpec {
  test("restart mass flows from the seed only; disconnected nodes stay 0") {
    val s = spark; import s.implicits._
    import graft.operators.PageRank
    // two disjoint 2-cycles; seed only a
    val edges = Seq(("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val r = PageRank.personalizedRanks(edges, seeds, iterations = 4)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("x") == 0L && r("y") == 0L, s"unreachable component must stay 0: $r")
    assert(r("a") > 0L && r("b") > 0L)
    assert(r("a") > r("b"), s"seed holds the fresher restart mass: $r")
  }
}

class DupNgramsSpec extends SparkSpec {
  test("shared trigram is scored in both docs; short docs score 0") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b c d e"),   // grams: abc bcd cde -> 1 of 3 shared
      (2L, "x y a b c"),   // grams: xya yab abc -> 1 of 3 shared
      (3L, "q w e r t"),   // all unique
      (4L, "too short")    // < 3 tokens -> no grams
    ).toDF("doc_id", "text")
    val out = graft.operators.DupNgrams.washFraction(docs, n = 3, minDocs = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 1L, 0.333333)), s"got $out")
    assert(out(2L) == ((3L, 1L, 0.333333)), s"got $out")
    assert(out(3L) == ((3L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)), "short doc contributes and scores nothing")
  }
}

class NodeClusteringSpec extends SparkSpec {
  test("triangle corners score by degree; pendant scores 0") {
    val s = spark; import s.implicits._
    // triangle 1-2-3 plus pendant edge 3-4 (edges normalized u < v)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val out = graft.operators.Triangles.nodeClustering(e)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 1L, 1.0)), s"got $out")
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((3L, 1L, 0.333333)), "hub diluted by the pendant")
    assert(out(4L) == ((1L, 0L, 0.0)), "degree-1 node defined as 0")
  }
}

class MixturePlannerSpec extends SparkSpec {
  test("binding source keeps everything; others downsample to the exact mix") {
    val s = spark; import s.implicits._
    // availability a:100 b:100; target 3:1 — b binds nothing, a binds?
    // avail/share: a: 100/.75=133, b: 100/.25=400 -> a binds (scale 133.33),
    // a keeps all 100, b keeps scale*.25 = 33.33 -> rate .333333, 33 docs
    val docs = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 200).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    val target = Seq(("a", 3.0), ("b", 1.0)).toDF("source", "weight")
    val out = graft.operators.MixturePlanner.plan(docs, target)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3), r.getLong(4))).toMap
    assert(out("a") == ((100L, 1.0, 100L)), s"got $out")
    assert(out("b") == ((100L, 0.333333, 33L)), s"got $out")
  }
}

class AbAssignmentSpec extends SparkSpec {
  test("assignment is stable per unit+salt; SRM chi2 matches hand computation") {
    val s = spark; import s.implicits._
    val users = (1L to 200L).toDF("user_id")
    val a1 = graft.operators.AbAssignment.assign(users, k = 4, salt = "x")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = graft.operators.AbAssignment.assign(users, k = 4, salt = "x")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2, "same salt must replay identically")
    val b = graft.operators.AbAssignment.assign(users, k = 4, salt = "y")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 != b, "different salt must re-randomize")
    assert(a1.values.toSet.subsetOf(Set(0, 1, 2, 3)))
    val row = graft.operators.AbAssignment.srmCheck(users, k = 4, salt = "x").head()
    val counts = a1.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = 200.0; val e = n / 4
    val chi2 = (0 to 3).map(a => { val o = counts.getOrElse(a, 0L); (o - e) * (o - e) / e }).sum
    assert(row.getAs[Long]("n") == 200L)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-6, s"chi2 ${row.getAs[Double]("chi2")} vs $chi2")
  }
}

class CurriculumOrderSpec extends SparkSpec {
  test("quartile strata alternate perfectly on 8 ranked docs") {
    val s = spark; import s.implicits._
    val docs = (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("doc_id", "score")
    val out = graft.operators.CurriculumOrder.interleave(docs, nBuckets = 4)
      .collect().map(_.getLong(0))
    // best-of-each-stratum first (8,6,4,2), then the seconds (7,5,3,1)
    assert(out.toSeq == Seq(8L, 6L, 4L, 2L, 7L, 5L, 3L, 1L), s"got ${out.toSeq}")
  }
}

class RobustOutliersSpec extends SparkSpec {
  test("MAD flags the wild point; degenerate MAD=0 group flags nothing") {
    val s = spark; import s.implicits._
    val df = (Seq(1L, 2L, 3L, 4L, 100L).map(("a", _)) ++
      Seq(10L, 10L, 10L, 10L, 1000L).map(("b", _))).toDF("g", "x")
    val out = graft.operators.RobustOutliers.perGroup(df, "g", "x")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out("a") == ((5L, 3.0, 1.0, 1L)), s"got $out")
    // median 10, MAD 0: modified z undefined -> defined as 0, none flagged
    assert(out("b") == ((5L, 10.0, 0.0, 0L)), s"got $out")
  }
}

class LabelAgreementSpec extends SparkSpec {
  test("a point planted in the wrong cluster is the suspect") {
    val s = spark; import s.implicits._
    def v(x: Float, y: Float) = Array(x, y)
    // two tight orthogonal clusters of 4; vec 8 sits in cluster 0's
    // corner but carries label 1 -> all its neighbors disagree
    val rows = (0 until 4).map(i => (i.toLong, v(1f, 0.001f * i), 0)) ++
      (4 until 8).map(i => (i.toLong, v(0.001f * i, 1f), 1)) :+
      ((8L, v(0.999f, 0.002f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = graft.operators.LabelAgreement.perLabel(emb, k = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out(0)._3 == 0L, s"cluster-0 points agree: $out")
    assert(out(1)._3 == 1L, s"exactly the planted point is suspect: $out")
    // the intruder costs BOTH labels: it is a wrong-label neighbor to
    // cluster 0 (their mean drops below k) and scores 0 itself
    assert(out(0)._2 < 3.0 && out(1)._2 < 3.0, s"means reflect the intruder: $out")
  }

  test("perLabelFrom audits any pre-computed neighbor frame (the ANN plug)") {
    val s = spark; import s.implicits._
    val emb = Seq((1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0), (3L, Array(1f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    // hand-built neighbor lists: 1->{2,3}, 2->{1}, 3->{1,2}
    val nn = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (3L, 2L))
      .toDF("query_id", "vec_id")
    val out = graft.operators.LabelAgreement.perLabelFrom(nn, emb, k = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // label 0: q1 matches {2}=1, q2 matches {1}=1 -> avg 1.0, both 2*1<2 false -> 0 suspects
    assert(out(0) === ((2L, 1.0, 0L)), s"got $out")
    // label 1: q3 matches none of {1,2} -> avg 0, suspect
    assert(out(1) === ((1L, 0.0, 1L)), s"got $out")
  }

  test("IVF-backed audit agrees with the exact audit on clustered data") {
    val s = spark; import s.implicits._
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val queries = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val nn = graft.operators.SimilaritySearch.ivfTopK(queries, emb, k = 5,
      centroidStep = 31, nProbe = 4, broadcastProbes = false)
    val ivf = graft.operators.LabelAgreement.perLabelFrom(nn, emb, k = 5)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val exact = graft.operators.LabelAgreement.perLabel(emb, k = 5)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(ivf.keySet === exact.keySet, "every label audited through the IVF plug")
    // the agreement-delta monitor: approximate neighbors may shift the
    // mean, but not by more than 1 of k=5 on average per label
    ivf.foreach { case (l, m) =>
      assert(math.abs(m - exact(l)) <= 1.0, s"label $l drifted: ivf=$m exact=${exact(l)}")
    }
  }
}
