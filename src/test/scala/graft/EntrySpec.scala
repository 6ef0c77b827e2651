package graft

/** Analysis-smoke gate over the ENTIRE declared query surface.
  *
  * Round 10 shipped a loader regression that killed 22 of 157 queries
  * at ANALYSIS time — and nothing in CI noticed, because no test plans
  * every `SparkEntry.queries` entry. This suite does exactly that: for
  * each declared query, build the DataFrame against sf0.001 and force
  * analysis + optimization (`queryExecution.optimizedPlan`). Any entry
  * that can't even plan fails the suite by name.
  *
  * Deliberately NOT an execution gate (the oracle harness owns that):
  * planning every query costs seconds, executing all 157 costs minutes
  * the unit suite shouldn't pay. Note some query closures do driver-side
  * work at construction (ML fits, streaming replay) — at sf0.001 that
  * stays cheap, and catching a constructor-time exception is precisely
  * the point.
  */
class EntrySpec extends SparkSpec {

  test("every declared query plans against sf0.001 (analysis smoke)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, TestSpark.sf0001).queryExecution.optimizedPlan
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} declared queries failed analysis:\n" + failures.mkString("\n"))
  }

  test("every declared query has an oracle entry or is a declared rows-only exception") {
    // the driver records a weaker rows-only check for queries absent from
    // oracleSql — that set must stay the deliberate ML-nondeterminism
    // list, not silently grow when someone forgets the SQL half
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val declared = SparkEntry.rowsOnlyByDesign
    assert(noOracle == declared,
      s"oracle-less queries drifted from the declared rows-only set:\n" +
        s"  missing oracle + undeclared: ${(noOracle -- declared).toSeq.sorted.mkString(", ")}\n" +
        s"  declared but now has oracle (or gone): ${(declared -- noOracle).toSeq.sorted.mkString(", ")}")
  }
}
