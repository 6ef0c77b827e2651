package graft

import graft.plans.NativeAsOfJoin
import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** The storage-layout as-of plan shape: an event log persisted once via
  * `Bucketing.writeBucketedSorted` (bucketed by key, sorted (key, time),
  * ONE file per bucket) must let the native sort-merge as-of exec plan
  * with ZERO Exchange and ZERO Sort on either side — the scan's
  * HashPartitioning satisfies the clustered distribution, its reported
  * sort order satisfies (key, time), and filters/aliases on top of the
  * scan preserve both. The values must match the same join off the raw
  * parquet, so the layout path changes plan cost only, never results.
  */
class BucketedAsOfSpec extends SparkSpec {

  private val table = "b_events_spec"

  private lazy val written: Unit = Bucketing.writeBucketedSorted(
    Tables.load(spark, TestSpark.sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
    table, nBuckets = 4, bucketKeys = Seq("user_id"), sortCols = Seq("ts"))

  private def joined(src: org.apache.spark.sql.DataFrame) = {
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val signups = src.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"),
        col("event_id").as("signup_id"))
    NativeAsOfJoin.asOf(clicks, signups, key = "user_id",
      leftTime = "ts", rightTime = "signup_ts",
      payloadCols = Seq("signup_id"), broadcast = Some(false))
  }

  test("as-of over the bucketed-sorted table: zero Exchange, zero Sort") {
    written
    val df = joined(spark.table(table))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), "native exec expected:\n" + p)
    assert(p.contains("Bucketed: true"), "scan should use buckets:\n" + p)
    assert(!p.contains("Exchange"), "bucketed as-of must not shuffle:\n" + p)
    assert(!p.contains("Sort ["), "bucketed-sorted as-of must not re-sort:\n" + p)
    assert(df.count() > 0)
  }

  test("layout path returns exactly the raw-parquet join's rows") {
    written
    val raw = Tables.load(spark, TestSpark.sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("click_id"), col("signup_id")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sorted.toSeq
    assert(rows(joined(spark.table(table))) === rows(joined(raw)))
  }

  test("interval join over two bucketed-sorted tables: zero Exchange, zero Sort") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    Bucketing.writeBucketedSorted(
      ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("point_id"),
          unix_micros(col("ts")).as("t")),
      "b_points_spec", nBuckets = 4, bucketKeys = Seq("user_id"), sortCols = Seq("t"))
    Bucketing.writeBucketedSorted(
      ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("window_id"),
          unix_micros(col("ts")).as("w_start"),
          (unix_micros(col("ts")) + 7200000000L).as("w_end")),
      "b_windows_spec", nBuckets = 4, bucketKeys = Seq("user_id"), sortCols = Seq("w_start"))
    val df = graft.plans.NativeIntervalJoin.contain(
      spark.table("b_points_spec"), spark.table("b_windows_spec"),
      key = "user_id", pointTime = "t", startCol = "w_start", endCol = "w_end",
      payloadCols = Seq("window_id"), broadcast = Some(false))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("IntervalJoin"), "native exec expected:\n" + p)
    assert(p.contains("Bucketed: true"), "scans should use buckets:\n" + p)
    assert(!p.contains("Exchange"), "bucketed interval join must not shuffle:\n" + p)
    assert(!p.contains("Sort ["), "bucketed-sorted interval join must not re-sort:\n" + p)
    assert(df.count() > 0)
  }

  test("contract boundary: a DERIVED time column forfeits the sort elimination " +
      "(Exchange still absent)") {
    written
    // unix_micros(ts) is not an alias of the stored sort column, so the
    // exec's (key, time) ordering requirement is no longer satisfied by
    // the scan — the Sort must come back, while the bucket-provided
    // distribution still kills the Exchange. This pins WHY
    // writeBucketedSorted materializes time columns at write.
    val src = spark.table(table)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("t"))
    val signups = src.filter(col("event_type") === "signup")
      .select(col("user_id"), unix_micros(col("ts")).as("signup_t"),
        col("event_id").as("signup_id"))
    val df = NativeAsOfJoin.asOf(clicks, signups, key = "user_id",
      leftTime = "t", rightTime = "signup_t",
      payloadCols = Seq("signup_id"), broadcast = Some(false))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "bucket distribution still holds:\n" + p)
    assert(p.contains("Sort ["), "derived time must re-sort — if this ever " +
      "passes sort-free, the materialize-at-write advice is stale:\n" + p)
  }

  test("writeBucketedSorted lays down exactly one file per bucket") {
    written
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val files = new java.io.File(wh, table).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    // bucket id is encoded as the _0000N suffix in the file name; every
    // bucket present at most once or the scan would drop its sort order
    val buckets = files.map(_.getName.replaceAll("^part-\\d+-.*_(\\d{5})\\..*$", "$1"))
    assert(buckets.length === buckets.distinct.length,
      s"multiple files share a bucket: ${files.map(_.getName).mkString(", ")}")
    assert(buckets.nonEmpty && buckets.length <= 4)
  }
}
