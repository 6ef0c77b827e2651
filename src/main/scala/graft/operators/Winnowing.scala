package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): slide a window of `w` consecutive k-gram hashes
  * over each document and keep, per window, the RIGHTMOST MINIMAL hash.
  * The selected (hash, position) set is the document's fingerprint with
  * two guarantees the all-grams table ([[DupNgrams]]) and whole-doc
  * MinHash ([[Dedup]]) don't give together: any match of length ≥
  * w + k − 1 tokens is DETECTED by at least one shared fingerprint, and
  * the fingerprint density is bounded (≈ 2/(w+1) of positions) — a
  * copy detector whose index is a fixed fraction of the corpus size.
  *
  * Determinism: gram hash = first 15 hex chars of md5 (the
  * [[CountMinSketch.cellHash]] house convention — exact in DuckDB too),
  * and the rightmost-min tie rule is the lexicographic minimum of
  * (hash, −pos) structs, so the fingerprint SET hash-replays across
  * engines and partitionings.
  *
  * Scale shape (100 TB): the gram stream is one narrow projection (id,
  * pos, hash-long); selection is ONE bounded window (w rows of state)
  * per document partition — no corpus-wide window, no join; `distinct`
  * shuffles only the selected ≈ 2/(w+1) fraction. The pair join runs on
  * the fingerprint hash like an LSH band join: cost Σ|bucket|², knobs
  * k and w.
  */
object Winnowing {

  private def gramHash(gram: Column): Column =
    conv(substring(md5(gram.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Fingerprint set: (id, h, pos) — the rightmost minimal k-gram hash
    * of every complete w-window, deduplicated (adjacent windows usually
    * reselect the same gram; that is the density bound at work).
    * Documents with fewer than k + w − 1 tokens yield no fingerprints.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1, s"fingerprints: k=$k must be >= 1")
    require(w >= 1, s"fingerprints: w=$w must be >= 1")
    // fan out before tokenize/shingle/gram-hash (guide §2.5); the
    // id-keyed window below then reuses the same hash partitioning
    val toks = ScanFanout.byKey(docs, col(idCol)).select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("_toks"))
    val grams = toks.select(col("id"),
      posexplode(TextFunctions.shinglesFromTokens(col("_toks"), k)).as(Seq("pos", "gram")))
    val win = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    grams.select(col("id"), col("pos"), gramHash(col("gram")).as("h"))
      // rightmost minimal hash of the window = lexicographic min of
      // (h, -pos): equal hashes prefer the LARGER position, per the
      // paper's robust-winnowing tie rule
      .withColumn("_sel", min(struct(col("h"), (-col("pos")).as("np"))).over(win))
      .filter(col("pos") >= w - 1) // only complete windows select
      .select(col("id"), col("_sel.h").as("h"), (-col("_sel.np")).as("pos"))
      .distinct()
  }

  /** Copy-candidate pairs: (id_a, id_b, n_shared) for document pairs
    * sharing ≥ `minShared` fingerprint hashes (id_a < id_b). The join
    * key is the fingerprint hash — LSH-band cost shape.
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Int): DataFrame = {
    require(minShared >= 1, s"candidatePairs: minShared=$minShared must be >= 1")
    val fp = fingerprints(docs, idCol, textCol, k, w)
      .select(col("id"), col("h")).distinct()
    fp.as("a").hint("shuffle_hash")
      .join(fp.as("b"), col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
