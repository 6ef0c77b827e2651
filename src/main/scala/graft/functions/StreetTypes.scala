package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Street-type classification from the street name's first word
  * (SURVEY D1) — the one per-row Python UDF the reference runs in its
  * hot path (`/root/reference/src/road_network.py:327-365`). Here it is
  * a single chained `when` expression over the lowercased first token:
  * whole-stage codegen'd, no UDF, no Python worker, no broadcast needed
  * (the table is 34 literals).
  */
object StreetTypes {

  /** keyword → type (reference's `assignation` table inverted). All
    * keywords lowercased — including "île", which the reference compares
    * in its original case against a lowercased token and therefore can
    * never match; treating that as a bug, not a behavior to replicate.
    */
  val keywordToType: Seq[(String, String)] = Seq(
    "allée" -> "allée", "autoroute" -> "autoroute", "avenue" -> "avenue",
    "boulevard" -> "boulevard", "carré" -> "carré", "square" -> "square",
    "carref." -> "carref.", "chemin" -> "chemin",
    "circle" -> "circle", "cercle" -> "circle",
    "côte" -> "côte", "cours" -> "cours", "court" -> "court",
    "crescent" -> "crescent", "croissant" -> "crescent",
    "drive" -> "drive", "esplanade" -> "esplanade", "île" -> "island",
    "impasse" -> "impasse", "lane" -> "lane", "lieu" -> "lieu",
    "montée" -> "montée", "parc" -> "park", "park" -> "park",
    "passage" -> "passage", "place" -> "place", "pont" -> "pont",
    "promenade" -> "promenade", "rang" -> "rang",
    "road" -> "road", "route" -> "road",
    "ruelle" -> "ruelle", "street" -> "street", "rue" -> "street",
    "terrasse" -> "terrasse")

  /** Type for a street-name column; null when no keyword matches (the
    * reference UDF returns None).
    */
  def streetType(name: Column): Column = {
    val first = lower(element_at(split(name, " "), 1))
    keywordToType.foldLeft(lit(null).cast("string")) { case (acc, (kw, tpe)) =>
      when(first === kw, tpe).otherwise(acc)
    }
  }
}
