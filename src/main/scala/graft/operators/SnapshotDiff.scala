package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot reconciliation: classify every document id across two
  * corpus versions as added / removed / changed / unchanged by content
  * hash — the daily-crawl-diff primitive that decides what an
  * incremental pipeline must reprocess (changed+added) and what it can
  * skip (unchanged, usually >99% of a 100 TB corpus).
  *
  * 100 TB design: ONE full-outer equi-join on the id carrying only
  * (id, 16-byte content hash) — document bodies never shuffle. When both
  * snapshots are written bucketed by id the join is zero-shuffle; the
  * downstream "reprocess set" is a semi-join of the big corpus against
  * the (small) added+changed id list.
  */
object SnapshotDiff {

  /** Per-id diff status between snapshots `v1` (old) and `v2` (new),
    * compared by md5 of `contentCol`.
    * Output: (doc_id, status string in {added, removed, changed,
    * unchanged}).
    */
  def diffStatus(v1: DataFrame, v2: DataFrame, idCol: String = "doc_id",
      contentCol: String = "text"): DataFrame = {
    def hashed(df: DataFrame, h: String) = df.select(
      col(idCol).as("doc_id"), md5(col(contentCol).cast("binary")).as(h))
    hashed(v1, "h1").join(hashed(v2, "h2"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h1").isNull, lit("added"))
          .when(col("h2").isNull, lit("removed"))
          .when(col("h1") === col("h2"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
