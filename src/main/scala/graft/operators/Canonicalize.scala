package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Canonical-document selection over near-duplicate components: the
  * step between FINDING duplicate clusters ([[Dedup.connectedComponents]])
  * and ACTING on them — every document maps to its cluster's canonical
  * representative (highest quality, ties to the smallest id; documents
  * outside any cluster are their own canonical), giving the exact
  * keep/drop set a dedup pass applies and the redirect table serving
  * systems keep. Deterministic: the winner is an argmax over (quality,
  * −id), so the same corpus always keeps the same documents.
  *
  * Scale shape (100 TB): one left join of the (sparse — only paired
  * docs) component table onto the corpus ids, one max_by aggregate per
  * component (map-side combined), one broadcast-sized join back.
  * Quality can be any numeric column or expression the caller derived.
  */
object Canonicalize {

  /** (id, component nullable, canonical_id, is_canonical) per document:
    * `components` is a (idCol → compCol) mapping covering only docs in
    * some cluster (the [[Dedup.connectedComponents]] shape).
    */
  def assign(docs: DataFrame, components: DataFrame, idCol: String,
      qualityCol: String, compCol: String = "component"): DataFrame = {
    val comp = components.select(col(idCol), col(compCol).as("component"))
    val withComp = docs.select(col(idCol), col(qualityCol).as("_q"))
      .join(comp, Seq(idCol), "left")
    val canon = withComp.filter(col("component").isNotNull)
      .groupBy(col("component"))
      .agg(max_by(col(idCol), struct(col("_q"), (-col(idCol)).as("_nid"))).as("_canon"))
    withComp.join(canon, Seq("component"), "left")
      .select(col(idCol), col("component"),
        coalesce(col("_canon"), col(idCol)).as("canonical_id"))
      .withColumn("is_canonical", col("canonical_id") === col(idCol))
  }
}
