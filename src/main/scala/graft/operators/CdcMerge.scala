package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply an ordered changelog of
  * upsert/delete operations onto a base snapshot and return the
  * current state — the MERGE INTO / compaction semantics every
  * incremental lakehouse pipeline needs, the point-in-time complement
  * to [[Scd2]]'s full-history build and [[SnapshotDiff]]'s
  * state-to-state comparison.
  *
  * Scale shape: the base snapshot enters the same union as the
  * changelog with sequence −∞, so resolution is ONE row_number window
  * partitioned by key (one hash shuffle, state bounded per key by its
  * change count — no join, no iteration). At 100 TB this is exactly
  * the merge-on-read compaction plan: shuffle by key, keep the
  * max-sequence survivor, drop tombstones.
  */
object CdcMerge {

  /** Current snapshot after applying `changes` to `base`.
    *
    * @param base    current rows, one per `key` (no `seqCol`/`opCol`)
    * @param changes changelog rows: same payload columns as `base`
    *                plus `seqCol` (total order per key; larger = later)
    *                and `opCol` ('U' upsert, 'D' delete)
    * @return the payload columns of the latest surviving row per key;
    *         keys whose latest op is 'D' are gone, unchanged base rows
    *         pass through.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      seqCol: String, opCol: String): DataFrame = {
    require(!base.columns.contains(seqCol) && !base.columns.contains(opCol),
      s"base must not carry $seqCol/$opCol")
    val seeded = base
      .withColumn(seqCol, lit(Long.MinValue))
      .withColumn(opCol, lit("U"))
    // seq ties (shouldn't happen in a well-formed log) break toward the
    // delete so a same-sequence U/D pair resolves deterministically
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc, col(opCol).asc)
    seeded.unionByName(changes.select(seeded.columns.map(col).toSeq: _*))
      .withColumn("_cdc_rn", row_number().over(w))
      .filter(col("_cdc_rn") === 1 && col(opCol) =!= "D")
      .drop("_cdc_rn", seqCol, opCol)
  }
}
