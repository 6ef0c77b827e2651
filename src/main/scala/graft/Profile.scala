package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf harness: time named queries (all, or argv names), twice
  * each, on SPARK_GRAFT_SF_DIR — separates plan/codegen warm-up from
  * steady-state cost so optimization targets the right thing.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.all.map(_.name)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-32s cold=${times.head}%8.2fs warm=${times.last}%8.2fs")
    }
    spark.stop()
  }
}
