package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-contract gate: `Tables.load` must absorb a fixture whose
  * physical types drifted (the round-10 regeneration incident,
  * generalized to every table). The drifted copy widens ints to longs,
  * re-encodes doubles as decimal(38,18) (wide enough to hold a double's
  * shortest decimal representation exactly, so values round-trip), and
  * rewrites timestamps as NTZ
  * — the three drifts parquet writers actually produce — then asserts
  * (a) every loaded column matches the declared contract type and (b) a
  * representative join query returns IDENTICAL rows from the drifted
  * and pristine fixtures.
  */
class TablesSpec extends SparkSpec {

  private def drift(dt: DataType): Option[DataType] = dt match {
    case IntegerType       => Some(LongType)
    case DoubleType        => Some(DecimalType(38, 18))
    case TimestampType     => Some(TimestampNTZType)
    case _                 => None
  }

  private def writeDrifted(dir: java.nio.file.Path): Unit =
    Tables.names.foreach { t =>
      val pristine = Tables.load(spark, TestSpark.sf0001, t)
      val drifted = Tables.contract(t).foldLeft(pristine) { case (df, (c, declared)) =>
        drift(declared).fold(df)(to => df.withColumn(c, col(c).cast(to)))
      }
      drifted.write.mode("overwrite").parquet(dir.resolve(s"$t.parquet").toString)
    }

  test("load conforms every contract column from a type-drifted fixture") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_")
    try {
      writeDrifted(dir)
      Tables.names.foreach { t =>
        val loaded = Tables.load(spark, dir.toString, t)
        Tables.contract(t).foreach { case (c, declared) =>
          assert(loaded.schema(c).dataType == declared,
            s"$t.$c: expected $declared, got ${loaded.schema(c).dataType}")
        }
      }
      // values survive the round trip, not just the types: pristine vs
      // drifted fixtures must produce identical rows through a query
      // that touches int keys, double aggregates, and event timestamps
      def rows(name: String, d: String) =
        SparkEntry.queries(name)(spark, d).collect().map(_.toString).sorted.toSeq
      Seq("q_join_revenue_by_nation", "q_window_cumulative").foreach { q =>
        assert(rows(q, TestSpark.sf0001) == rows(q, dir.toString),
          s"$q diverged between pristine and drifted fixtures")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
