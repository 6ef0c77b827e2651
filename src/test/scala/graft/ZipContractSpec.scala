package graft

import graft.plans.ZipContract
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, SinglePartition, UnknownPartitioning}
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The pure co-partitioning checker behind the native joins' runtime
  * zip guards — synthetic partitionings cover the cases the planner
  * can't easily be coerced into producing in a spec.
  */
class ZipContractSpec extends AnyFunSuite {

  private val la = AttributeReference("la", LongType)()
  private val lb = AttributeReference("lb", LongType)()
  private val ra = AttributeReference("ra", LongType)()
  private val rb = AttributeReference("rb", LongType)()

  test("aligned hash partitionings pass; counts must match") {
    assert(ZipContract.violation(
      HashPartitioning(Seq(la, lb), 8), HashPartitioning(Seq(ra, rb), 8),
      8, 8, Seq(la, lb), Seq(ra, rb)).isEmpty)
    assert(ZipContract.violation(
      HashPartitioning(Seq(la), 8), HashPartitioning(Seq(ra), 4),
      8, 4, Seq(la), Seq(ra)).exists(_.contains("unequal child partition counts")))
  }

  test("SWAPPED key order fails even with equal counts — the silent mis-zip case") {
    // left hashes (a, b) while right hashes (b, a): identical key values
    // land in different partitions; a count-only guard would pass this
    val v = ZipContract.violation(
      HashPartitioning(Seq(la, lb), 8), HashPartitioning(Seq(rb, ra), 8),
      8, 8, Seq(la, lb), Seq(ra, rb))
    assert(v.exists(_.contains("not an aligned join-key pair")), v)
  }

  test("hash arity mismatch fails; key-subset hashing on ONE side fails") {
    assert(ZipContract.violation(
      HashPartitioning(Seq(la, lb), 8), HashPartitioning(Seq(ra), 8),
      8, 8, Seq(la, lb), Seq(ra, rb)).exists(_.contains("arity")))
    // both hash one column, but it's a different key position each side
    assert(ZipContract.violation(
      HashPartitioning(Seq(la), 8), HashPartitioning(Seq(rb), 8),
      8, 8, Seq(la, lb), Seq(ra, rb)).exists(_.contains("aligned")))
    // the SAME key position on both sides (a valid sub-key clustering)
    assert(ZipContract.violation(
      HashPartitioning(Seq(lb), 8), HashPartitioning(Seq(rb), 8),
      8, 8, Seq(la, lb), Seq(ra, rb)).isEmpty)
  }

  test("single partition is trivially co-partitioned; non-hash pairs fall back to counts") {
    assert(ZipContract.violation(SinglePartition, SinglePartition,
      1, 1, Seq(la), Seq(ra)).isEmpty)
    assert(ZipContract.violation(UnknownPartitioning(4), UnknownPartitioning(4),
      4, 4, Seq(la), Seq(ra)).isEmpty)
    assert(ZipContract.violation(UnknownPartitioning(4), UnknownPartitioning(2),
      4, 2, Seq(la), Seq(ra)).isDefined)
  }
}
