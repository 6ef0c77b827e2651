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

/** Scoped log quieting for suites whose tests DELIBERATELY make Spark
  * tasks fail or abort (RetrySpec's injected first-attempt failures,
  * SkewIntervalJoinSpec's replication-cap refusal, the streaming
  * suites' query.stop() racing an in-flight state-store commit —
  * CANNOT_WRITE_STATE_STORE). The scenarios are correct and asserted;
  * the expected ERROR stack traces they spray into the test log cost
  * real minutes in a grep-for-ERROR triage of a green run. The noisy
  * task-path loggers go OFF for exactly the suite's duration and are
  * restored after, so genuine failures in every OTHER suite keep
  * their full traces.
  */
trait QuietDeliberateErrors extends org.scalatest.BeforeAndAfterAll {
  this: org.scalatest.Suite =>

  private val noisy = Seq(
    "org.apache.spark.executor.Executor",
    "org.apache.spark.scheduler.TaskSetManager",
    "org.apache.spark.util.Utils",
    "org.apache.spark.TaskContextImpl",
    "org.apache.spark.sql.execution.datasources.v2.DataWritingSparkTask",
    "org.apache.spark.sql.execution.datasources.v2.WriteToDataSourceV2Exec")
  private var prior: Seq[(String, org.apache.logging.log4j.Level)] = Nil

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    TestSpark.spark // session init sets the root level these inherit
    prior = noisy.map(n =>
      n -> org.apache.logging.log4j.LogManager.getLogger(n).getLevel)
    noisy.foreach(n => org.apache.logging.log4j.core.config.Configurator
      .setLevel(n, org.apache.logging.log4j.Level.OFF))
  }

  override protected def afterAll(): Unit = {
    try prior.foreach { case (n, l) =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(n, l)
    } finally super.afterAll()
  }
}
