package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution: candidate pairs come only from
  * shared blocking keys (never all-pairs), survive an edit-distance
  * gate, and each dirty record keeps its single best match — the
  * classic record-linkage shape (blocking → comparison → selection)
  * that reconciles free-text names, addresses, or product titles
  * against a master table.
  *
  * Scale shape (100 TB): the blocking join is an equi-join on the
  * block key, so cost is Σ|block|² — block design (multi-attribute
  * keys here) is the knob, exactly as in [[Dedup]]'s LSH bands and
  * [[AssociationRules]]'s baskets. levenshtein runs only inside
  * blocks and is codegen'd; best-match selection is one
  * WindowGroupLimit per dirty id, no global sort.
  */
object EntityResolution {

  /** Best match per dirty record. Both inputs need (id, name) plus the
    * `blockCols`; candidates outside `maxDistance` are dropped, ties
    * break on the lower clean id.
    * Output: (d_id, c_id, lev int), ordered by d_id.
    */
  def resolve(dirty: DataFrame, clean: DataFrame, blockCols: Seq[String],
      maxDistance: Int = 2): DataFrame = {
    require(blockCols.nonEmpty)
    // fan out the probe side (guide §2.5): when the clean side
    // broadcasts, the blocked-pair levenshtein loop runs on the dirty
    // side's partitioning — a one-task scan without this
    val d = ScanFanout.byKey(dirty, col("id"))
      .select(col("id").as("d_id") +: col("name").as("d_name") +:
      blockCols.map(col): _*)
    val c = clean.select(col("id").as("c_id") +: col("name").as("c_name") +:
      blockCols.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("d_id")).orderBy(col("lev").asc, col("c_id").asc)
    d.join(c, blockCols)
      .withColumn("lev", levenshtein(col("d_name"), col("c_name")))
      .filter(col("lev") <= maxDistance)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("d_id"), col("c_id"), col("lev"))
  }
}
