package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * changes. Cost: right side × nSalts, so `deriveSalts` sizes the salt
  * count from the observed key histogram rather than "big to be safe".
  */
object SaltedJoin {

  private def saltSides(left: DataFrame, right: DataFrame,
      nSalts: Int): (DataFrame, DataFrame, Column) = {
    require(nSalts > 0, s"nSalts=$nSalts must be positive")
    // salt assignment (hash of a per-row id) is arbitrary by
    // construction — any distribution of left rows over salts yields the
    // same join result, because the right side is replicated to EVERY salt
    val sl = left.withColumn("_lsalt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts.toLong)).cast("int"))
    val sr = right.withColumn("_rsalt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    (sl, sr, col("_lsalt") === col("_rsalt"))
  }

  /** Inner equi-join of `left` and `right` on leftKey = rightKey with
    * the left side salted over `nSalts` sub-keys.
    */
  def inner(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      nSalts: Int): DataFrame = {
    val (sl, sr, saltEq) = saltSides(left, right, nSalts)
    sl.join(sr, saltEq && col(leftKey) === col(rightKey))
      .drop("_lsalt", "_rsalt")
  }

  /** Left-outer salted equi-join — the more common heavy-hitter shape:
    * the hot key is usually a null-ish/default value whose rows MUST be
    * preserved (enrichment joins keep every fact row). A left row's
    * matches live entirely inside its own salt bucket (the right side is
    * replicated to all salts), so the outer semantics survive salting
    * row-identically: unmatched left rows emit once with null right
    * columns, exactly like the unsalted join.
    */
  def leftOuter(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      nSalts: Int): DataFrame = {
    val (sl, sr, saltEq) = saltSides(left, right, nSalts)
    sl.join(sr, saltEq && col(leftKey) === col(rightKey), "left_outer")
      .drop("_lsalt", "_rsalt")
  }

  /** Salt count derived from the OBSERVED key histogram instead of a
    * caller constant: one aggregation finds the heaviest key's row
    * count; the salt count is what it takes to split that key into
    * reducer-sized chunks of `rowsPerSalt`, capped at `maxSalts`
    * (replication cost on the right side is linear in the salt count).
    * The aggregation is map-side combined — at 100 TB it shuffles one
    * row per distinct key per task, and the result is a single scalar
    * action, not a collected histogram.
    */
  def deriveSalts(left: DataFrame, leftKey: String,
      rowsPerSalt: Long = 2000000L, maxSalts: Int = 256): Int = {
    require(rowsPerSalt > 0 && maxSalts > 0)
    val heaviest = left.groupBy(col(leftKey)).agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L))).head.getLong(0)
    val needed = (heaviest + rowsPerSalt - 1) / rowsPerSalt
    math.max(1L, math.min(needed, maxSalts.toLong)).toInt
  }
}
