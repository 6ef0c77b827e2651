package graft

import graft.operators.{KmvSketch, SkewAsOfJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retry-determinism probe: every operator claims hash-replayability,
  * so a Spark TASK RETRY (lost executor, preempted container — routine
  * at 100 TB) must reproduce byte-identical output. The shared test
  * session runs `local[4,2]` (`maxTaskFailures = 2`); a shim throws on
  * the FIRST attempt of one input partition, forcing a real task
  * failure + re-execution inside three representative shuffle-heavy
  * queries, and the output hash is pinned equal to the failure-free
  * run.
  */
class RetrySpec extends SparkSpec with QuietDeliberateErrors {

  private def events: DataFrame = Tables.load(spark, TestSpark.sf0001, "events")

  /** The input, with partition 0's task failing on its first attempt
    * (every attempt after that passes). Routed through an RDD so the
    * failure happens in a real task, not at planning time.
    */
  private def flaky(df: DataFrame, tag: String): DataFrame = {
    val schema = df.schema
    val rdd = df.rdd.mapPartitionsWithIndex { (i, it) =>
      val tc = org.apache.spark.TaskContext.get()
      if (i == 0 && tc != null && tc.attemptNumber() == 0)
        throw new RuntimeException(
          s"GRAFT_RETRY_PROBE($tag): injected first-attempt task failure")
      it
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  private def hashOf(df: DataFrame): String = {
    val joined = df.collect().map(_.mkString("|")).sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(joined.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def windowQuery(in: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    in.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        row_number().over(w).as("rn"),
        sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("run"))
      .filter(col("rn") <= 5)
      .select(col("user_id"), col("event_id"), col("rn"), round(col("run"), 6).as("run"))
  }

  private def kmvQuery(in: DataFrame): DataFrame =
    KmvSketch.distinctEstimate(in.filter(col("user_id").isNotNull),
      groupCol = "event_type", keyCol = "user_id", k = 64)

  private def bucketedAsOf(in: DataFrame): DataFrame = {
    val clicks = in.filter(col("event_type") === "click")
      .select(col("user_id").as("k"), col("ts").cast("long").as("rt"),
        col("event_id").as("click_id"))
    val purchases = in.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), col("ts").cast("long").as("t"),
        col("event_id").as("purchase_id"))
    SkewAsOfJoin.asOfBucketed(purchases, clicks, key = "k",
      leftTime = "t", rightTime = "rt", payloadCols = Seq("click_id"),
      bucketWidth = 3600L)
  }

  private def pinRetryEquality(name: String, q: DataFrame => DataFrame): Unit = {
    val clean = hashOf(q(events))
    val retried = hashOf(q(flaky(events, name)))
    assert(retried == clean,
      s"$name: output after an injected task retry must hash-equal the clean run")
  }

  test("window query output is unchanged by a task retry") {
    pinRetryEquality("window", windowQuery)
  }

  test("KMV sketch estimate is unchanged by a task retry") {
    pinRetryEquality("kmv", kmvQuery)
  }

  test("bucketed as-of join output is unchanged by a task retry") {
    pinRetryEquality("bucketed-asof", bucketedAsOf)
  }

  test("the injected failure is real: with retries exhausted the job fails") {
    // throws on EVERY attempt → even maxFailures=2 cannot save it; this
    // pins that the probe above actually exercised the retry path
    // (i.e. the passing tests are not just the shim never firing)
    val schema = events.schema
    val rdd = events.rdd.mapPartitionsWithIndex { (i, it) =>
      if (i == 0) throw new RuntimeException("GRAFT_RETRY_PROBE: permanent failure")
      it
    }
    val always = spark.createDataFrame(rdd, schema)
    val e = intercept[org.apache.spark.SparkException] {
      windowQuery(always).collect()
    }
    assert(e.getMessage.contains("GRAFT_RETRY_PROBE"))
  }
}
