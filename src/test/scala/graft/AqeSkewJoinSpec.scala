package graft

import graft.plans.{AsOfJoinExec, IntervalJoinExec, NativeAsOfJoin, NativeIntervalJoin}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.GraftSkewProbe

/** AQE skew-splitting on the native sort-merge joins
  * (`OptimizeSkewedGraftJoin`): a hot left key that lands one reducer
  * partition far above the skew threshold is split into map-range
  * slices at runtime — the exec carries `isSkewJoin=true`, its left
  * read has PartialReducerPartitionSpecs and MORE partitions than
  * `spark.sql.shuffle.partitions` — with results identical to the
  * unsplit plan. This is what makes the bucketed SkewAsOfJoin rewrite
  * an optimization rather than a correctness necessity for left-side
  * skew.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val shufflePartitions = 4 // the shared test session's setting

  /** Hot-key left side: `hot` rows of key "H" + a uniform tail, spread
    * over 16 input partitions so the shuffle has map-range boundaries
    * to split at (slice granularity is map outputs).
    */
  private def skewedLeft(hot: Int): DataFrame = {
    val rows = (0 until hot).map(i => ("H", i.toLong, i.toLong)) ++
      (0 until 30).flatMap(k => (0 until 50).map(i => (s"k$k", i.toLong, (100000 + k * 100 + i).toLong)))
    spark.createDataset(spark.sparkContext.parallelize(rows, 16)).toDF("k", "t", "id")
  }

  private def rightSide(): DataFrame = {
    val rows = (Seq("H") ++ (0 until 30).map(k => s"k$k")).flatMap { k =>
      (0 until 40).map(i => (k, i.toLong * 7, s"$k-$i"))
    }
    spark.createDataset(spark.sparkContext.parallelize(rows, 4)).toDF("k", "rt", "px")
  }

  private def intervalsSide(): DataFrame = {
    val rows = (Seq("H") ++ (0 until 30).map(k => s"k$k")).flatMap { k =>
      (0 until 40).map(i => (k, i.toLong * 7, i.toLong * 7 + 10, s"$k-$i"))
    }
    spark.createDataset(spark.sparkContext.parallelize(rows, 4)).toDF("k", "s", "e", "px")
  }

  /** Low thresholds so a ~MB hot partition counts as skewed in a test
    * JVM; broadcast disabled so the sort-merge exec is chosen.
    */
  private def withSkewConfs[T](body: => T): T = {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
    val olds = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally olds.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("as-of: AQE splits a hot left partition; results equal the unsplit plan") {
    withSkewConfs {
      val l = skewedLeft(hot = 120000)
      val r = rightSide()
      def query() = NativeAsOfJoin.asOf(l, r, key = "k", leftTime = "t",
        rightTime = "rt", payloadCols = Seq("px"), joinType = LeftOuter,
        broadcast = Some(false))

      val skewed = query()
      val skewedRows = sortedRows(skewed)
      val exec = TestSpark.findExec[AsOfJoinExec](skewed.queryExecution.executedPlan)
        .getOrElse(fail("no AsOfJoinExec in:\n" + skewed.queryExecution.executedPlan))
      assert(exec.isSkewJoin, "hot-key as-of must be skew-split:\n" +
        skewed.queryExecution.executedPlan)
      val (lSpecs, lPartial) = GraftSkewProbe.describeRead(exec.left)
        .getOrElse(fail("no AQE read under the left child"))
      assert(lPartial > 0, "left read must carry PartialReducerPartitionSpecs")
      assert(lSpecs > shufflePartitions,
        s"split must yield MORE tasks than shuffle.partitions: $lSpecs")
      val (rSpecs, rPartial) = GraftSkewProbe.describeRead(exec.right)
        .getOrElse(fail("no AQE read under the right child"))
      assert(rSpecs == lSpecs, "spec lists must stay pairwise-aligned")
      assert(rPartial == 0, "the as-of RIGHT side must never split " +
        "(per-slice 'latest' would be wrong)")

      // ground truth: same query, skew splitting off → plain zip plan
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val baselineRows = try sortedRows(query())
        finally spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      assert(skewedRows.length == baselineRows.length)
      assert(skewedRows == baselineRows, "skew-split results must be identical")
    }
  }

  test("interval: AQE splits a hot point-side partition under INNER") {
    withSkewConfs {
      val l = skewedLeft(hot = 120000)
      val r = intervalsSide()
      def query() = NativeIntervalJoin.contain(l, r, key = "k", pointTime = "t",
        startCol = "s", endCol = "e", payloadCols = Seq("px"), joinType = Inner,
        broadcast = Some(false))

      val skewed = query()
      val skewedRows = sortedRows(skewed)
      val exec = TestSpark.findExec[IntervalJoinExec](skewed.queryExecution.executedPlan)
        .getOrElse(fail("no IntervalJoinExec in:\n" + skewed.queryExecution.executedPlan))
      assert(exec.isSkewJoin, "hot-key interval join must be skew-split:\n" +
        skewed.queryExecution.executedPlan)
      val (lSpecs, lPartial) = GraftSkewProbe.describeRead(exec.left)
        .getOrElse(fail("no AQE read under the left child"))
      assert(lPartial > 0 && lSpecs > shufflePartitions)
      val (rSpecs, _) = GraftSkewProbe.describeRead(exec.right)
        .getOrElse(fail("no AQE read under the right child"))
      assert(rSpecs == lSpecs, "spec lists must stay pairwise-aligned")

      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val baselineRows = try sortedRows(query())
        finally spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      assert(skewedRows == baselineRows, "skew-split results must be identical")
    }
  }

  test("uniform corpus does not split") {
    withSkewConfs {
      val rows = (0 until 30).flatMap(k => (0 until 100).map(i => (s"k$k", i.toLong, i.toLong)))
      val l = spark.createDataset(spark.sparkContext.parallelize(rows, 8)).toDF("k", "t", "id")
      val joined = NativeAsOfJoin.asOf(l, rightSide(), key = "k", leftTime = "t",
        rightTime = "rt", payloadCols = Seq("px"), broadcast = Some(false))
      joined.collect()
      val exec = TestSpark.findExec[AsOfJoinExec](joined.queryExecution.executedPlan)
        .getOrElse(fail("no AsOfJoinExec in:\n" + joined.queryExecution.executedPlan))
      assert(!exec.isSkewJoin, "a uniform corpus must keep the plain plan")
    }
  }

  test("runtime stats re-route the as-of to the BROADCAST exec under AQE " +
      "(DynamicJoinSelection for the native join)") {
    // a right side whose STATIC size estimate is far above the
    // broadcast threshold but whose RUNTIME (post-filter) bytes are far
    // below it: initial planning picks the sort-merge exec; once the
    // right shuffle stage materializes, AQE re-plans from the logical
    // plan with LogicalQueryStage runtime stats and AsOfJoinStrategy
    // must switch to BroadcastAsOfJoinExec — the huge-left-side win
    // (no left exchange) arriving at runtime, like Spark's own
    // DynamicJoinSelection.
    val l = skewedLeft(hot = 2000)
    val rBig = rightSide()
    // static stats: Filter keeps the child's size estimate (no CBO
    // selectivity), so this filtered side "looks big" until it runs
    val r = rBig.filter(col("k") === "H")
    val staticBytes = r.queryExecution.optimizedPlan.stats.sizeInBytes
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (staticBytes / 2).toString)
    try {
      val joined = NativeAsOfJoin.asOf(l, r, key = "k", leftTime = "t",
        rightTime = "rt", payloadCols = Seq("px")) // broadcast knob UNSET: auto
      val rows = sortedRows(joined)
      val bcast = TestSpark.findExec[graft.plans.BroadcastAsOfJoinExec](
        joined.queryExecution.executedPlan)
      assert(bcast.isDefined,
        "runtime-small right must re-route to the broadcast exec:\n" +
          joined.queryExecution.executedPlan)
      // ground truth: the forced sort-merge plan on the same inputs
      val expect = sortedRows(NativeAsOfJoin.asOf(l, r, key = "k", leftTime = "t",
        rightTime = "rt", payloadCols = Seq("px"), broadcast = Some(false)))
      assert(rows == expect, "re-routed plan must produce identical results")

      // same contract on the interval join (shared strategy ladder)
      val rInt = intervalsSide().filter(col("k") === "H")
      val joinedInt = NativeIntervalJoin.contain(l, rInt, key = "k",
        pointTime = "t", startCol = "s", endCol = "e", payloadCols = Seq("px"))
      joinedInt.collect()
      assert(TestSpark.findExec[graft.plans.BroadcastIntervalJoinExec](
        joinedInt.queryExecution.executedPlan).isDefined,
        "runtime-small interval side must re-route to the broadcast exec:\n" +
          joinedInt.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("skewJoin.enabled=false keeps the plain plan even under skew") {
    withSkewConfs {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      try {
        val joined = NativeAsOfJoin.asOf(skewedLeft(hot = 120000), rightSide(),
          key = "k", leftTime = "t", rightTime = "rt", payloadCols = Seq("px"),
          broadcast = Some(false))
        joined.collect()
        val exec = TestSpark.findExec[AsOfJoinExec](joined.queryExecution.executedPlan).get
        assert(!exec.isSkewJoin)
      } finally spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    }
  }
}
