package graft

/** Plan-quality audit main: prints the formatted physical plan of named
  * queries (argv, or a load-bearing default set) and flags the signals
  * that matter at 100 TB — missing parquet filter pushdown, full-column
  * scans, cartesian products, and windows without partitioning.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // optional: write each query's formatted plan to
    // $SPARK_GRAFT_PLAN_DIR/<query>_$SPARK_GRAFT_PLAN_TAG.txt (the
    // optimization rounds' before/after plan evidence), besides stdout
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planTag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val spark = Sessions.local(appName = "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_join_revenue_by_nation", "q_geo_knn_match", "q_dedup_jaccard_pairs",
      "q_ann_brute_topk", "q_window_rank_topk_orders", "q_ml_assemble_roundtrip")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n===================== $name =====================")
      println(plan)
      planDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"${name}_$planTag.txt"), plan)
      }
      // iterative operators persist intermediates at build time; drop
      // them so one audit's blocks don't skew the next query's plan
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
