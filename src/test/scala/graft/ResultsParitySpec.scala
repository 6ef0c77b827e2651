package graft

import graft.ml.Trainers
import graft.operators.ThresholdMetrics
import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.functions._

import scala.io.Source

/** Golden STRUCTURAL parity against the reference's committed result
  * artifacts (the CSVs under `/root/reference/results/brf` — public
  * content, read as fixtures): the engine's M10 threshold curve and M11 feature
  * importances must match the artifacts column-for-column in schema,
  * grid, and metric definitions. Value parity is impossible without
  * the scraped source data (BASELINE.md); everything structural is
  * asserted here instead.
  */
class ResultsParitySpec extends SparkSpec {

  import spark.implicits._

  // overridable so the suite skips (not errors) on machines without the
  // reference checkout at the default location
  private val brfDir = sys.props.get("graft.reference.brf")
    .orElse(sys.env.get("GRAFT_REFERENCE_BRF"))
    .getOrElse("/root/reference/results/brf")

  /** Cancels (ScalaTest `assume`) the calling test when the reference
    * artifacts are absent — parity is a fixture-dependent golden, not a
    * portable invariant.
    */
  private def requireArtifacts(): Unit =
    assume(new java.io.File(brfDir).isDirectory,
      s"reference artifacts not present at $brfDir " +
        "(set -Dgraft.reference.brf or GRAFT_REFERENCE_BRF)")

  private def csv(path: String): Seq[Seq[String]] = {
    val src = Source.fromFile(path)
    // these artifacts are plain pandas to_csv output: no quoting, no
    // embedded commas — a straight split is exact (split with -1 keeps
    // trailing empty cells, which the 1.0 metrics row has)
    try src.getLines().map(_.split(",", -1).toSeq).toList finally src.close()
  }

  private lazy val engineCurve = {
    // binary label (the reference's predictions are binary; the curve's
    // percentage columns only partition 1 over a binary label)
    val scored = Tables.load(spark, TestSpark.sf0001, "embeddings")
      .select((((col("vec_id") * 37) % 97) / 96.0).as("prob"),
        (col("label") % 2).as("label"))
    ThresholdMetrics.referenceCurve(scored, nPoints = 20, probCol = "prob")
  }

  test("metrics.csv: engine curve reproduces the artifact's exact column set") {
    requireArtifacts()
    val header = csv(s"$brfDir/metrics.csv").head
    assert(engineCurve.columns.toSeq === header,
      s"engine columns ${engineCurve.columns.toSeq} != artifact header $header")
  }

  test("metrics.csv: the artifact's 20-threshold grid is the engine's grid") {
    requireArtifacts()
    val rows = csv(s"$brfDir/metrics.csv").tail
    assert(rows.size === 20, s"artifact has ${rows.size} threshold rows")
    val artifactGrid = rows.map(_.head.toDouble)
    assert(artifactGrid === (1 to 20).map(_ / 20.0),
      "artifact thresholds are (b+1)/20 upper edges")
    val engineGrid = engineCurve.select("Threshold").collect().map(_.getDouble(0)).toSeq
    // the engine emits the -1 domain bucket (threshold 0.0) and, when a
    // probability hits 1.0 exactly, the overflow bucket — the artifact
    // grid must appear inside it verbatim, same step, same edges
    assert(artifactGrid.forall(engineGrid.contains),
      s"engine grid $engineGrid must cover the artifact grid")
  }

  test("metrics.csv: the artifact's metric definitions are the engine's definitions") {
    requireArtifacts()
    // prove on the ARTIFACT's own rows that its columns obey exactly
    // the formulas referenceCurve computes: F1 = 2PR/(P+R), Accuracy =
    // TP% + TN%, FPR = FP%/(FP% + TN%), and the four percentages
    // partition 1 — so matching schema + grid means matching semantics
    val header = csv(s"$brfDir/metrics.csv").head
    val idx = header.zipWithIndex.toMap
    val rows = csv(s"$brfDir/metrics.csv").tail.filter(_.forall(_.nonEmpty))
    assert(rows.size >= 19, "all but the degenerate 1.0 row are fully populated")
    rows.foreach { r =>
      def v(c: String) = r(idx(c)).toDouble
      val (p, rec) = (v("Precision"), v("Recall"))
      assert(math.abs(v("F1 Score") - 2 * p * rec / (p + rec)) < 1e-9, r)
      assert(math.abs(v("Accuracy") -
        (v("True positive percentage") + v("True negative percentage"))) < 1e-9, r)
      assert(math.abs(v("False positive rate") -
        v("False positive percentage") /
          (v("False positive percentage") + v("True negative percentage"))) < 1e-9, r)
      val pctSum = Seq("True negative percentage", "True positive percentage",
        "False negative percentage", "False positive percentage").map(v).sum
      assert(math.abs(pctSum - 1.0) < 1e-9, r)
    }
    // and the same identities hold on the engine frame's COMPLETE rows
    // (the -1..n-1 domain; an overflow bucket only carries the labels
    // that actually reached it, so its percentages don't partition 1 —
    // same as the reference code on the same input)
    def pctSumOf(r: org.apache.spark.sql.Row): Double =
      Seq("True negative percentage", "True positive percentage",
        "False negative percentage", "False positive percentage")
        .map(c => r.getDouble(r.fieldIndex(c))).sum
    val eng = engineCurve.na.drop().collect().filter(r => math.abs(pctSumOf(r) - 1) < 1e-9)
    assert(eng.size >= 20, s"at least the artifact's 20 rows are complete, got ${eng.size}")
    eng.foreach { r =>
      def v(c: String) = r.getDouble(r.fieldIndex(c))
      if (v("Precision") + v("Recall") > 0)
        assert(math.abs(v("F1 Score") -
          2 * v("Precision") * v("Recall") / (v("Precision") + v("Recall"))) < 1e-9)
      assert(math.abs(v("Accuracy") -
        (v("True positive percentage") + v("True negative percentage"))) < 1e-9)
    }
  }

  // ---- parity across ALL FOUR model families the reference ships ----
  // (brf above is the deep check; these prove the engine's curve and
  // results shapes hold for base/urf/xgb too, not just one model)

  private def resultsDir = new java.io.File(brfDir).getParent

  test("metrics.csv: all four families (base/brf/urf/xgb) share the engine's column set") {
    requireArtifacts()
    Seq("base", "brf", "urf", "xgb").foreach { fam =>
      val header = csv(s"$resultsDir/$fam/metrics.csv").head
      assert(engineCurve.columns.toSeq === header, s"family $fam header mismatch")
    }
  }

  test("metrics.csv: the metric identities hold on every family's artifact rows") {
    requireArtifacts()
    Seq("base", "brf", "urf", "xgb").foreach { fam =>
      val lines = csv(s"$resultsDir/$fam/metrics.csv")
      val idx = lines.head.zipWithIndex.toMap
      val rows = lines.tail.filter(_.forall(_.nonEmpty))
      assert(rows.nonEmpty, s"family $fam has no complete rows")
      rows.foreach { r =>
        def v(c: String) = r(idx(c)).toDouble
        if (v("Precision") + v("Recall") > 0)
          assert(math.abs(v("F1 Score") -
            2 * v("Precision") * v("Recall") / (v("Precision") + v("Recall"))) < 1e-9,
            s"$fam: $r")
        assert(math.abs(v("Accuracy") -
          (v("True positive percentage") + v("True negative percentage"))) < 1e-9,
          s"$fam: $r")
        if (v("False positive percentage") + v("True negative percentage") > 0)
          assert(math.abs(v("False positive rate") -
            v("False positive percentage") /
              (v("False positive percentage") + v("True negative percentage"))) < 1e-9,
            s"$fam: $r")
        val pctSum = Seq("True negative percentage", "True positive percentage",
          "False negative percentage", "False positive percentage").map(v).sum
        assert(math.abs(pctSum - 1.0) < 1e-9, s"$fam: $r")
      }
      // every family's threshold grid lives inside the engine's grid
      val engineGrid = engineCurve.select("Threshold").collect().map(_.getDouble(0)).toSet
      val famGrid = lines.tail.map(_.head.toDouble)
      assert(famGrid.forall(engineGrid.contains),
        s"$fam grid $famGrid must be covered by the engine grid")
    }
  }

  test("results: every family's AUPRC/AUROC export carries exactly resultsFrame's quantity set") {
    requireArtifacts()
    // the reference's write_results text format: 'Test set:'/'Train
    // set:' sections each with 'Area Under PR/ROC = x' — parse it and
    // require exactly the four (split, metric) pairs resultsFrame
    // emits, with finite values in (0, 1]
    val metricOf = Map("Area Under PR" -> "areaUnderPR", "Area Under ROC" -> "areaUnderROC")
    Seq("base", "brf", "urf", "xgb").foreach { fam =>
      val lines = scala.io.Source.fromFile(s"$resultsDir/$fam/results").getLines().toList
      var split = ""
      val found = scala.collection.mutable.ListBuffer[(String, String, Double)]()
      lines.foreach {
        case l if l.trim == "Test set:" => split = "test"
        case l if l.trim == "Train set:" => split = "train"
        case l if l.contains("=") =>
          val Array(name, value) = l.trim.split(" = ", 2)
          found += ((split, metricOf(name.trim), value.toDouble))
        case _ => ()
      }
      assert(found.map(t => (t._1, t._2)).toSet ===
        Set(("test", "areaUnderPR"), ("test", "areaUnderROC"),
          ("train", "areaUnderPR"), ("train", "areaUnderROC")),
        s"family $fam quantity set mismatch: $found")
      assert(found.forall(t => t._3 > 0.0 && t._3 <= 1.0), s"family $fam values: $found")
    }
  }

  test("feature_importances.csv: engine export mirrors the artifact's shape") {
    requireArtifacts()
    val lines = csv(s"$brfDir/feature_importances.csv")
    assert(lines.head === Seq("", "Feature importances"),
      "artifact: unnamed feature index + one importance column")
    val artifact = lines.tail.map(r => r(0) -> r(1).toDouble)
    assert(artifact.nonEmpty)
    assert(math.abs(artifact.map(_._2).sum - 1.0) < 1e-6,
      "artifact importances sum to 1 (RF normalization)")
    assert(artifact.map(_._2) === artifact.map(_._2).sortBy(-_),
      "artifact is sorted by importance descending")

    // a tiny deterministic forest: the engine export must carry the
    // same invariants — (name, value) rows, normalized, sorted desc
    val df = spark.range(0, 400).select(
      ($"id" % 7).cast("double").as("f1"),
      ($"id" % 3).cast("double").as("f2"),
      ($"id" % 11).cast("double").as("f3"),
      (($"id" % 7 >= 4).cast("double")).as("label"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("f1", "f2", "f3")).setOutputCol("features")
      .transform(df)
    val rf = new RandomForestClassifier()
      .setNumTrees(5).setMaxDepth(4).setSeed(42L).fit(assembled)
    val exported = Trainers.featureImportances(rf, Seq("f1", "f2", "f3"), spark)
    assert(exported.columns.toSeq === Seq("feature", "importance"),
      "two columns: name + importance, like the artifact's index + value")
    val rows = exported.collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    assert(rows.map(_._1).toSet === Set("f1", "f2", "f3"))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-6)
    assert(rows.map(_._2) === rows.map(_._2).sortBy(-_))
    assert(rf.isInstanceOf[RandomForestClassificationModel])
  }
}
