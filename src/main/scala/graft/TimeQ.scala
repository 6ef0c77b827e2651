package graft

/** Dev harness: time named queries at SPARK_GRAFT_SF_DIR, after a
  * warm-up run of each at sf0.001 (same fairness protocol as Bench).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local(appName = "graft-timeq")
    spark.sparkContext.setLogLevel("WARN")
    require(args.nonEmpty, "usage: TimeQ q_name [q_name...]")
    args.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case e: Throwable => System.err.println(s"[warm] $name: ${e.getMessage}") }
    }
    args.foreach { name =>
      // mirror Bench's isolation protocol exactly: drop persisted blocks
      // and GC before the timer, so repeated names measure a cold query
      // (CacheManager otherwise plan-matches the previous identical run's
      // persisted intermediates and reports flattered times)
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMEQ $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }
    spark.stop()
  }
}
