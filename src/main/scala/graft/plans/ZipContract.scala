package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.{
  HashPartitioning, Partitioning, SinglePartition}

/** The co-partitioning contract behind the native joins' pairwise
  * partition zip, checked at runtime in both sort-merge execs.
  *
  * EnsureRequirements plans both children to satisfy
  * `ClusteredDistribution(keys)` and verifies cross-child spec
  * compatibility — but that is a PLANNING-time guarantee; the execs
  * re-verify at execution so a planner/AQE behavior change can never
  * mis-zip silently:
  *
  *  - equal partition counts (the checkable minimum — also what
  *    `zipPartitions` itself enforces, with an unnamed error);
  *  - when both children report [[HashPartitioning]] (the normal case —
  *    hash partitionings are what satisfies ClusteredDistribution after
  *    an exchange): the hash expressions must be the two key lists
  *    ALIGNED POSITIONALLY — left hashing (a, b) while right hashes
  *    (b, a) would pass a count check and join garbage;
  *  - both sides [[SinglePartition]] (or 1 partition) is trivially
  *    co-partitioned;
  *  - any OTHER partitioning pair (e.g. DSv2 KeyGroupedPartitioning
  *    from storage-partitioned sources) is left to the count check —
  *    EnsureRequirements' compatibility logic is authoritative there,
  *    and rejecting it here would break valid storage-partitioned
  *    plans.
  */
object ZipContract {

  /** None = compatible; Some(reason) = violation to raise by name. */
  def violation(lPart: Partitioning, rPart: Partitioning,
      lParts: Int, rParts: Int,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute]): Option[String] = {
    if (lParts != rParts)
      return Some(s"unequal child partition counts (left=$lParts right=$rParts)")
    (lPart, rPart) match {
      case (SinglePartition, SinglePartition) => None
      case _ if lParts == 1 => None
      case (lh: HashPartitioning, rh: HashPartitioning) =>
        if (lh.expressions.length != rh.expressions.length)
          Some(s"hash key arity differs (left=${lh.expressions.length} " +
            s"right=${rh.expressions.length})")
        else {
          // positional alignment: expression i of each side must be the
          // SAME join key position, else identical key values hash to
          // different partitions
          val misaligned = lh.expressions.zip(rh.expressions).zipWithIndex.collectFirst {
            case ((le, re), i)
                if !leftKeys.indices.exists(k =>
                  le.semanticEquals(leftKeys(k)) && re.semanticEquals(rightKeys(k))) =>
              s"hash expression $i (left=$le right=$re) is not an aligned join-key pair"
          }
          misaligned
        }
      case _ => None // non-hash partitionings: counts checked above,
                     // compatibility was EnsureRequirements' call
    }
  }
}
