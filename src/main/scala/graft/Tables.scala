package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated star schema (see /root/repo/TESTDATA.md).
  *
  * All engine operators take DataFrames; these helpers centralize the
  * path convention `sfDir/<name>.parquet` AND the schema contract: each
  * table declares the logical types downstream queries are written
  * against, and `load` casts any column whose physical type drifted
  * (int widened to long, double re-encoded as decimal, timestamp written
  * as NTZ or nanos...). Round 10 showed why: the fixture generator
  * changed events.ts from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and a
  * loader hard-coded to one physical type killed 22 queries at analysis
  * time. With the contract, a regenerated fixture is absorbed at the
  * one place every query reads through.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The logical column types every query in this repo assumes. Columns
    * present in a fixture but absent here pass through untouched;
    * contract columns missing from a fixture are left to fail analysis
    * in the first query that needs them (loudly, by name).
    */
  val contract: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  /** Normalize an events `ts` column to session-zoned TimestampType,
    * whatever physical type the fixture was written with. The generator
    * has shipped both TIMESTAMP(NANOS) (no Spark type — read as long via
    * spark.sql.legacy.parquet.nanosAsLong=true, set by graft.Sessions)
    * and plain TIMESTAMP(MICROS); a loader hard-coded to either breaks
    * the moment the fixture regenerates (round 10's 22-query outage).
    * The session runs in UTC, so the NTZ→TZ cast is numerically exact.
    * The long branch must run BEFORE the generic contract cast: a plain
    * long→timestamp CAST reads seconds, not nanos.
    */
  def normalizeEventsTs(tsType: DataType): Column = tsType match {
    case LongType =>
      // Nanos as long: truncate to micros with exact integer division
      // (ns values exceed 2^53, so floating-point would corrupt them).
      timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType => col("ts").cast(TimestampType)
    case _                => col("ts")
  }

  /** Cast every contract column whose loaded physical type differs from
    * its declared logical type. NTZ timestamps cast exactly under the
    * session's UTC zone; numeric widenings/narrowings go through ANSI
    * cast, so a value that can't survive the declared type fails loudly
    * instead of wrapping.
    */
  private def conform(df: DataFrame, name: String): DataFrame =
    contract.get(name).fold(df) { cols =>
      cols.foldLeft(df) { case (d, (c, t)) =>
        if (d.columns.contains(c) && d.schema(c).dataType != t)
          d.withColumn(c, col(c).cast(t))
        else d
      }
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val tsNormalized =
      if (name == "events" && raw.schema.fieldNames.contains("ts"))
        raw.withColumn("ts", normalizeEventsTs(raw.schema("ts").dataType))
      else raw
    conform(tsNormalized, name)
  }

  /** Register every table as a temp view so `spark.sql` queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
