package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD-2 (slowly-changing-dimension, type 2) history maintenance: the
  * warehouse primitive that turns a stream of full snapshots into a
  * row-versioned history with `[valid_from, valid_to)` intervals — the
  * "what did this row say on day X" table that incremental corpus
  * reprocessing, provenance audits, and training-set freezes all read.
  * [[SnapshotDiff]] answers "what changed"; this persists the answer.
  *
  * Scale shape (100 TB): one merge = ONE full-outer join between the
  * OPEN slice of the history and the new snapshot, both hashed on the
  * id — closed rows never ride the shuffle (they are untouched by
  * definition and union in column-pruned). Only (id, hash) shuffles;
  * bodies stay in the source table. History naturally bucketizes by
  * id for exchange-free successive merges.
  */
object Scd2 {

  /** Apply one snapshot to an existing history.
    *
    * @param history (id, h, valid_from int, valid_to int-or-null);
    *   rows with null valid_to are the open (current) slice.
    * @param snapshot (id, h) — the complete state at `version`; an id
    *   absent from it is a deletion.
    * @return updated history, same schema. Open rows whose hash is
    *   unchanged stay open; changed/deleted rows close at `version`;
    *   changed/added ids open a new row at `version`.
    */
  def merge(history: DataFrame, snapshot: DataFrame, version: Int,
      idCol: String = "id"): DataFrame = {
    val closed = history.filter(col("valid_to").isNotNull)
    val open = history.filter(col("valid_to").isNull)
      .select(col(idCol), col("h"), col("valid_from"))
    val snap = snapshot.select(col(idCol), col("h").as("h_new"))
    val j = open.join(snap, Seq(idCol), "full_outer")
    // one pass over the join decides all four outcomes
    val stillOpen = j.filter(col("h").isNotNull && col("h_new").isNotNull &&
        col("h") === col("h_new"))
      .select(col(idCol), col("h"), col("valid_from"), lit(null).cast("int").as("valid_to"))
    val nowClosed = j.filter(col("h").isNotNull &&
        (col("h_new").isNull || col("h") =!= col("h_new")))
      .select(col(idCol), col("h"), col("valid_from"), lit(version).as("valid_to"))
    val opened = j.filter(col("h_new").isNotNull &&
        (col("h").isNull || col("h") =!= col("h_new")))
      .select(col(idCol), col("h_new").as("h"), lit(version).as("valid_from"),
        lit(null).cast("int").as("valid_to"))
    closed.unionByName(stillOpen).unionByName(nowClosed).unionByName(opened)
  }

  /** Bootstrap a history from the first snapshot. */
  def init(snapshot: DataFrame, version: Int, idCol: String = "id"): DataFrame =
    snapshot.select(col(idCol), col("h"), lit(version).as("valid_from"),
      lit(null).cast("int").as("valid_to"))

  /** Point-in-time read: the rows valid AT `version` — the
    * "as-of day X" reconstruction that makes the history useful. A
    * partition filter on valid_from plus the open-interval predicate;
    * at scale the history's id-bucketing makes this exchange-free
    * into a downstream join.
    */
  def snapshotAt(history: DataFrame, version: Int, idCol: String = "id"): DataFrame =
    history.filter(col("valid_from") <= version &&
        (col("valid_to").isNull || col("valid_to") > version))
      .select(col(idCol), col("h"))
}
