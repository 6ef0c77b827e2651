package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage instrumentation (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")

    def time(name: String)(f: => Long): Unit = {
      var n = 0L
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        n = f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $name%-28s cold=${times.head}%8.2fs warm=${times.last}%8.2fs n=$n")
    }

    // simhash stages
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    time("toks")(toks.count())
    val h = xxhash64(col("tok"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"_b$i")
    }
    val fp = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i => when(col(s"_b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
    time("fp")(fp.count())
    val blocked = fp.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(i => struct(lit(i).as("blk"),
        shiftright(col("fp"), i * 16).bitwiseAND(0xFFFFL).as("bkey"))): _*)).as("b"))
      .select(col("doc_id"), col("fp"), col("b.blk").as("blk"), col("b.bkey").as("bkey"))
    time("blocked")(blocked.count())
    time("bucket_pairs")(blocked.as("a").join(blocked.as("b"),
      col("a.blk") === col("b.blk") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id")).count())

    // minhash stages
    val sh = docs.select(col("doc_id"), explode(array_distinct(shingles(col("text"), 3))).as("shingle"))
    time("shingles")(sh.count())
    val mins = (0 until 32).map(i => min(xxhash64(col("shingle"), lit(42L + i))).as(s"_m$i"))
    val sigs = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until 32).map(i => col(s"_m$i")): _*).as("sig"))
    time("sigs")(sigs.count())
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(expr("transform(sequence(0, 7), b -> struct(b as band, xxhash64(concat_ws(',', slice(sig, b*4+1, 4))) as bhash))")).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bhash").as("bhash"))
    time("banded")(banded.count())
    val bucketed = banded.withColumn("_bsz",
      count(lit(1)).over(Window.partitionBy(col("band"), col("bhash"))))
      .filter(col("_bsz") <= 1000)
    time("bucketed")(bucketed.count())
    time("mh_pairs")(bucketed.as("a").join(bucketed.as("b"),
      col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
        col("a.doc_id") < col("b.doc_id")).count())
    spark.stop()
  }
}
