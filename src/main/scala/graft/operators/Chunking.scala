package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget document chunking with overlap — the windowing step that
  * turns variable-length documents into model-sized training/RAG pieces:
  * chunk c covers tokens [c·stride, c·stride + budget) with stride =
  * budget − overlap, and the chunk count is ⌈(n − overlap) / stride⌉
  * (min 1), so consecutive chunks share `overlap` tokens and the tail is
  * always covered.
  *
  * Pure per-row generate: tokens are projected ONCE per document, the
  * chunk index explodes from a `sequence`, and each chunk is a `slice` of
  * the materialized token array — no shuffle at all (the plan is scan →
  * project → generate), which is the whole point at 100 TB: chunking is
  * embarrassingly parallel and must never cost an exchange.
  */
object Chunking {

  /** @param carryCols extra document columns carried onto every chunk
    *                   row (e.g. the mixture source) — carrying beats a
    *                   post-hoc join back to the document table, which
    *                   would re-scan the whole upstream pipeline or
    *                   force a persist.
    */
  def tokenChunks(docs: DataFrame, budget: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0 && overlap >= 0 && overlap < budget,
      s"need 0 <= overlap < budget, got budget=$budget overlap=$overlap")
    val stride = budget - overlap
    val carry = carryCols.map(col)
    val toked = docs.select(
        col(idCol).as("doc_id") +: tokens(col(textCol)).as("_toks") +: carry: _*)
      .withColumn("_n", size(col("_toks")))
    val nChunks = greatest(lit(1),
      ceil((col("_n") - overlap).cast("double") / stride).cast("int"))
    toked
      .select(col("doc_id") +: col("_toks") +:
        explode(sequence(lit(0), nChunks - 1)).as("chunk_ix") +: carry: _*)
      .select(col("doc_id") +: col("chunk_ix") +:
        slice(col("_toks"), col("chunk_ix") * stride + 1, lit(budget)).as("_chunk") +:
        carry: _*)
      .select(col("doc_id") +: col("chunk_ix") +:
        size(col("_chunk")).as("n_chunk_tokens") +:
        md5(concat_ws(" ", col("_chunk")).cast("binary")).as("chunk_md5") +: carry: _*)
  }
}
