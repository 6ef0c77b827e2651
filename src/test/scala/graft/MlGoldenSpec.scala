package graft

/** Exact-value GOLDENS for the five rows-only seeded ML fits (the only
  * queries the DuckDB gate can't hash-check): under fixed seeds the
  * in-JVM fits are bit-deterministic, so any silent MLlib behavior
  * drift (a Spark upgrade changing sampling streams, tree tie-breaks,
  * evaluator interpolation) fails HERE instead of shipping unnoticed.
  *
  * The values are tied to the test session's fixed parallelism
  * (local[4], shuffle.partitions=4 — `TestSpark`): the hash-replayable
  * undersampler and RF bootstrap streams are partition-layout-dependent
  * by design (the same property the split-audit queries pin), so a
  * DIFFERENT parallelism is expected to give different (equally valid)
  * metrics — the golden catches drift at CONSTANT config, which is what
  * CI runs.
  *
  * Re-baseline procedure (only after an INTENDED change — new Spark
  * version, changed trainer params): run
  * `sbt "testOnly graft.MlGoldenSpec"` once, copy the printed
  * `GOLDEN <query> | ...` lines over the maps below, and note the cause
  * in the commit message. Never loosen to a range — the floors already
  * live in TrainersSpec/MlSpec; this spec exists to be exact.
  */
class MlGoldenSpec extends SparkSpec {

  private def rows(q: String): Seq[String] =
    SparkEntry.queries(q)(spark, TestSpark.sf0001).collect()
      .map(_.mkString("|")).toSeq

  private def check(q: String, want: Seq[String]): Unit = {
    val got = rows(q)
    got.foreach(r => info(s"GOLDEN $q | $r"))
    assert(got.sorted === want.sorted, s"$q drifted from golden — if the change " +
      "is intended (Spark upgrade / param change), re-baseline per the scaladoc")
  }

  test("q_ml_rf_train_metrics golden (seed 42, local[4])") {
    check("q_ml_rf_train_metrics", Seq(
      "test|areaUnderPR|0.995",
      "test|areaUnderROC|0.9974",
      "train|areaUnderPR|0.9976",
      "train|areaUnderROC|0.999"))
  }

  test("q_ml_gbt_train_metrics golden (seed 42, local[4])") {
    check("q_ml_gbt_train_metrics", Seq(
      "test|areaUnderPR|0.8057",
      "test|areaUnderROC|0.8944",
      "train|areaUnderPR|0.9415",
      "train|areaUnderROC|0.9678"))
  }

  test("q_ml_rf_importances golden (seed 42, local[4])") {
    check("q_ml_rf_importances", Seq(
      "sum_qty|0.7457", "n_items|0.0857", "sum_price|0.0842", "sum_tax|0.064",
      "avg_price|0.01", "max_discount|0.0055", "total_price|0.0029",
      "o_month|0.002"))
  }

  test("q_ml_tvs_best golden (seed 42, local[4])") {
    check("q_ml_tvs_best", Seq(
      "5|3|1.0|5|3", "5|5|1.0|5|3", "10|3|1.0|5|3", "10|5|1.0|5|3"))
  }

  test("q_ml_cv_best golden (seed 42, local[4])") {
    check("q_ml_cv_best", Seq(
      "5|3|0.9027|10|3|16", "5|5|0.9027|10|3|16",
      "10|3|0.9807|10|3|16", "10|5|0.9807|10|3|16"))
  }
}
