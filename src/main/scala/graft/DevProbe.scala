package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Temporary dev probe for the q_graph_modularity phase split. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-devprobe")
    spark.sparkContext.setLogLevel("WARN")
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // mirror the query lambda
    (1 to 2).foreach { runNo =>
      println(s"--- run $runNo ---")
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val li = Tables.load(spark, sfDir, "lineitem")
      val e0 = li.select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst")).distinct()
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      phase("edges-materialize")(edges.count())
      val labels = phase("propagate")(graft.operators.LabelPropagation.propagate(edges, rounds = 2, edgesDistinct = true))
      val scored = phase("score-build")(graft.operators.Modularity.score(edges, labels))
      phase("score-run") {
        scored.select(col("community"), col("n_nodes"), col("e_in"), col("d_sum"),
            round(col("q_contrib"), 9).as("q_contrib"), round(col("q"), 9).as("q"))
          .orderBy(col("n_nodes").desc, col("community")).limit(15).count()
      }
    }
    spark.stop()
  }
}
