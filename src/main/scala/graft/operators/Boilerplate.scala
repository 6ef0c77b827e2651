package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style boilerplate removal: a "line" that recurs across many
  * distinct documents (navigation chrome, license headers, templated
  * footers) is dropped from every document that contains it.
  *
  * The corpus tables here carry flat token streams with no newlines, so
  * a "line" is a non-overlapping window of `lineTokens` whitespace
  * tokens — the same fixed-width pseudo-line the chunking operator uses.
  * On real web text, swap [[lines]]' splitter for `split(text, '\n')`
  * and the rest of the pipeline is unchanged.
  *
  * Scale shape (100 TB):
  *  - the document-frequency shuffle carries only (md5(line), doc_id) —
  *    line TEXT never rides the wide shuffle;
  *  - the boilerplate set (lines with df ≥ minDocs) is orders of
  *    magnitude smaller than the corpus; the mark join is hash-equi on
  *    the 32-char digest and AQE broadcasts it when it fits;
  *  - the rebuild is one shuffle of surviving lines keyed by document —
  *    linear in corpus size, no pairwise blowup anywhere.
  */
object Boilerplate {

  /** Explode documents into (idCol, line_no, line) fixed-width
    * pseudo-lines; the tail window is kept short rather than dropped.
    */
  def lines(docs: DataFrame, lineTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(lineTokens >= 1, s"lineTokens=$lineTokens must be >= 1")
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    // fan out before tokenize + line explosion (guide §2.5)
    ScanFanout.byKey(docs, col(idCol))
      .select(col(idCol), toks.as("_toks"))
      .select(col(idCol),
        posexplode(transform(
          // greatest(1, ·) dodges sequence()'s descending mode on the
          // (theoretical) empty-token case — split() never returns an
          // empty array for non-null text, but a -1 stop would silently
          // emit [0, -1] instead of failing
          sequence(lit(0), greatest(lit(1), ceil(size(col("_toks")) / lineTokens.toDouble).cast("int")) - 1),
          i => array_join(slice(col("_toks"), i * lineTokens + 1, lit(lineTokens)), " "))))
      .select(col(idCol), col("pos").as("line_no"), col("col").as("line"))
  }

  /** Digests of lines occurring in at least `minDocs` distinct docs. */
  def boilerplateDigests(lineDf: DataFrame, minDocs: Int,
      idCol: String = "doc_id"): DataFrame =
    lineDf.select(md5(col("line")).as("lh"), col(idCol))
      .groupBy(col("lh"))
      .agg(countDistinct(col(idCol)).as("_ndocs"))
      .filter(col("_ndocs") >= minDocs)
      .select(col("lh"))

  /** Rebuild each document without its boilerplate lines. Output:
    * (idCol, n_lines, n_removed, clean_text) — clean_text is "" for a
    * document whose every line was boilerplate.
    */
  def removeBoilerplate(docs: DataFrame, lineTokens: Int, minDocs: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val lineDf = lines(docs, lineTokens, idCol, textCol)
    val bp = boilerplateDigests(lineDf, minDocs, idCol)
    val marked = lineDf
      .join(bp, md5(col("line")) === col("lh"), "left")
      .select(col(idCol), col("line_no"), col("line"), col("lh").isNotNull.as("_bp"))
    marked
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("_bp"), 1).otherwise(0)).cast("int").as("n_removed"),
        array_sort(collect_list(when(!col("_bp"), struct(col("line_no"), col("line")))))
          .as("_kept"))
      .select(col(idCol), col("n_lines"), col("n_removed"),
        array_join(transform(col("_kept"), x => x("line")), " ").as("clean_text"))
  }
}
