package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Temporary dev probe: q_text_cosine_pairs phase split. */
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
    (1 to 3).foreach { runNo =>
      println(s"--- run $runNo ---")
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val docs = Tables.load(spark, sfDir, "documents")
      val n = 3; val maxTermDf = 100; val scale = 1L << 16
      val tf = docs
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("_toks"))
        .select(col("doc_id"), explode(TextFunctions.shinglesFromTokens(col("_toks"), n)).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val overCap = dfreq.filter(col("df") > maxTermDf).select(col("term"))
      val nDocs = phase("docs-count")(docs.count()).toDouble
      val w = tf.join(broadcast(overCap), Seq("term"), "left_anti")
        .join(dfreq, Seq("term"))
        .select(col("doc_id"), col("term"),
          floor(col("tf") * log(lit(nDocs) / col("df")) * scale).as("wq"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      phase("w-materialize")(w.count())
      val nrm = w.groupBy(col("doc_id")).agg(sum(col("wq") * col("wq")).as("nrm2"))
      phase("nrm")(nrm.count())
      val dots = w.as("a").hint("shuffle_hash")
        .join(w.as("b"), col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          (col("a.wq") * col("b.wq")).as("part"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).cast("int").as("n_common"), sum(col("part")).as("dot"))
      phase("pair-join+agg")(dots.count())
      w.unpersist()
    }
    spark.stop()
  }
}
