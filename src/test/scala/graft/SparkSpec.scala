package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session — suites
  * run sequentially in sbt's forked test JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.local(cpus = "4", appName = "graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
