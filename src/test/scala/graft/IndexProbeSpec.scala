package graft

import graft.operators.{FdAudit, LabelPropagation, Modularity, ZOrder}
import org.apache.spark.sql.functions._

/** Modularity (X153), FD audit (X154), z-order range probe (X155). */
class IndexProbeSpec extends SparkSpec {

  import spark.implicits._

  test("modularity: two disjoint triangles under the perfect partition score 0.5") {
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (12L, 10L))
      .toDF("node", "lbl")
    val rows = Modularity.score(edges, labels).collect()
    // 2m = 12; per community: e_in = 6, d_sum = 6 -> (6*12 - 36)/144 = 0.25
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("e_in") === 6L && r.getAs[Long]("d_sum") === 6L)
      assert(math.abs(r.getAs[Double]("q_contrib") - 0.25) < 1e-12)
      assert(math.abs(r.getAs[Double]("q") - 0.5) < 1e-12)
    }
    // the all-in-one partition scores 0: e_in = 2m and d_sum = 2m
    val one = labels.withColumn("lbl", lit(1L))
    val q0 = Modularity.score(edges, one).select(max(col("q"))).as[Double].head()
    assert(math.abs(q0 - (1.0 - 1.0)) < 1e-12 || math.abs(q0) < 1e-12)
  }

  test("modularity: an unlabeled edge endpoint fails fast instead of skewing Q") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val partial = Seq((1L, 1L), (2L, 1L)).toDF("node", "lbl") // node 3 unlabeled
    val e = intercept[IllegalArgumentException] {
      Modularity.score(edges, partial).collect()
    }
    assert(e.getMessage.contains("no label"), e.getMessage)
  }

  test("FD audit: a held dependency shows zero violations, a broken one counts") {
    val df = Seq((1, "a", "x"), (1, "a", "y"), (2, "b", "x"), (3, "a", "x"))
      .toDF("k", "v", "w")
    val out = FdAudit.audit(Seq((df, "k", "v"), (df, "k", "w")))
      .collect().map(r => r.getString(0) + ">" + r.getString(1) ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("n_violating"),
          r.getAs[Long]("max_distinct"))).toMap
    assert(out("k>v") === ((3L, 0L, 1L)), "k determines v")
    assert(out("k>w") === ((3L, 1L, 2L)), "k=1 maps to two w values")
  }

  test("z-range decomposition is exactly the box — exhaustive on a 16x16 grid") {
    val bits = 4
    def morton(x: Long, y: Long): Long =
      (0 until bits).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1)))
        .reduce(_ | _)
    val boxes = Seq((0L, 15L, 0L, 15L), (0L, 0L, 0L, 0L), (3L, 11L, 5L, 13L),
      (1L, 2L, 14L, 15L), (7L, 8L, 7L, 8L), (0L, 15L, 6L, 6L))
    boxes.foreach { case (x0, x1, y0, y1) =>
      val ranges = ZOrder.zQueryRanges(x0, x1, y0, y1, bits)
      val fromRanges = ranges.flatMap { case (lo, hi) => lo to hi }.toSet
      val expected = (for (x <- x0 to x1; y <- y0 to y1) yield morton(x, y)).toSet
      assert(fromRanges === expected, s"box [$x0,$x1]x[$y0,$y1]")
      // ranges are disjoint, sorted, and maximally coalesced
      ranges.sliding(2).foreach {
        case Seq((_, h), (l, _)) => assert(l > h + 1)
        case _ =>
      }
    }
  }

  test("z-probe query pushes its range predicates into the parquet scan") {
    val df = SparkEntry.queries("q_source_zorder_probe")(spark, TestSpark.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      ("GreaterThanOrEqual\\(z".r.findFirstIn(plan).nonEmpty ||
        "PushedFilters: \\[.*z".r.findFirstIn(plan).nonEmpty),
      "z range predicates must reach the scan:\n" + plan)
    assert(df.count() > 0, "probe box must be non-empty at sf0.001")
  }

  test("k-anonymity: class sizes, diversity floor, and the at-risk flag") {
    val df = Seq(
      ("a", 1, "x"), ("a", 1, "y"), ("a", 1, "x"), // class (a,1): size 3, div 2
      ("b", 2, "x"), ("b", 2, "x"),                // class (b,2): size 2, div 1
      ("c", 3, "z")                                // class (c,3): size 1, div 1
    ).toDF("qi1", "qi2", "sens")
    val out = graft.operators.KAnonymity.audit(df, Seq("qi1", "qi2"), "sens", k = 2)
      .collect().map(r => r.getAs[Long]("class_size") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("min_diversity"), r.getAs[Boolean]("at_risk")))).toMap
    assert(out(3L) === ((1L, 3L, 2L, false)))
    assert(out(2L) === ((1L, 2L, 1L, false)))
    assert(out(1L) === ((1L, 1L, 1L, true)), "singleton class is re-identifiable")
  }

  test("labelprop + modularity compose: the fixture partition scores positive Q") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val e0 = li.select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val labels = LabelPropagation.propagate(edges, rounds = 2)
    val q = Modularity.score(edges, labels).select(max(col("q"))).as[Double].head()
    assert(!q.isNaN && q > -1.0 && q <= 1.0)
  }
}
