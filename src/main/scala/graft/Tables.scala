package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated star schema (see /root/repo/TESTDATA.md).
  *
  * All engine operators take DataFrames; these helpers only centralize the
  * path convention `sfDir/<name>.parquet` so every query reads through one
  * place (making it trivial to swap in partitioned/bucketed layouts later).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize an events `ts` column to session-zoned TimestampType,
    * whatever physical type the fixture was written with. The generator
    * has shipped both TIMESTAMP(NANOS) (no Spark type — read as long via
    * spark.sql.legacy.parquet.nanosAsLong=true, set by graft.Sessions)
    * and plain TIMESTAMP(MICROS); a loader hard-coded to either breaks
    * the moment the fixture regenerates (round 10's 22-query outage).
    * The session runs in UTC, so the NTZ→TZ cast is numerically exact.
    */
  def normalizeEventsTs(tsType: DataType): Column = tsType match {
    case LongType =>
      // Nanos as long: truncate to micros with exact integer division
      // (ns values exceed 2^53, so floating-point would corrupt them).
      timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType => col("ts").cast(TimestampType)
    case _                => col("ts")
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      raw.withColumn("ts", normalizeEventsTs(raw.schema("ts").dataType))
    else raw
  }

  /** Register every table as a temp view so `spark.sql` queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
