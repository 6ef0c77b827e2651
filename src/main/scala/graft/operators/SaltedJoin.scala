package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi-join for pathological heavy-hitter keys.
  *
  * AQE's runtime skew-join split (enabled in `graft.Sessions`) handles
  * moderate skew; when a single key dominates a partition beyond what
  * post-shuffle splitting can fix — the classic case at 100 TB is a
  * null-ish or default-valued key holding 10%+ of a fact table — the
  * standard remedy is salting: spread each left key over `nSalts`
  * sub-keys and replicate the (smaller) right side once per salt, so
  * the hot key's rows land on `nSalts` different reducers. Output is
  * row-identical to the plain join; only the shuffle distribution
  * changes. Cost: right side × nSalts, so size the salt count from the
  * observed skew, not "big to be safe".
  */
object SaltedJoin {

  /** Inner equi-join of `left` and `right` on leftKey = rightKey with
    * the left side salted over `nSalts` sub-keys. The salt assignment
    * (hash of a per-row id) is arbitrary by construction — any
    * distribution of left rows over salts yields the same join result.
    */
  def inner(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      nSalts: Int): DataFrame = {
    require(nSalts > 0, s"nSalts=$nSalts must be positive")
    val sl = left.withColumn("_lsalt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts.toLong)).cast("int"))
    val sr = right.withColumn("_rsalt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    sl.join(sr, col("_lsalt") === col("_rsalt") && col(leftKey) === col(rightKey))
      .drop("_lsalt", "_rsalt")
  }
}
