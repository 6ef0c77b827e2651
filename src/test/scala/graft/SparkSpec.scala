package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session — suites
  * run sequentially in sbt's forked test JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    // maxTaskFailures = 2 (master local[4,2]): lets RetrySpec exercise
    // real task retries; a genuinely-broken task still fails the test
    // (it throws on every attempt), so no failure is masked
    val s = Sessions.local(cpus = "4", appName = "graft-test", maxTaskFailures = 2)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"

  /** Find an exec node of type T anywhere in an executed plan,
    * descending through AQE wrappers (AdaptiveSparkPlanExec holds its
    * current plan out-of-tree; QueryStageExec wraps materialized
    * subtrees) — plain collectFirst stops at those boundaries.
    */
  def findExec[T <: org.apache.spark.sql.execution.SparkPlan](
      p: org.apache.spark.sql.execution.SparkPlan)(
      implicit ct: scala.reflect.ClassTag[T]): Option[T] = p match {
    case t if ct.runtimeClass.isInstance(t) => Some(t.asInstanceOf[T])
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      findExec[T](a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      findExec[T](s.plan)
    case other => other.children.iterator.flatMap(findExec[T](_)).nextOption()
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
