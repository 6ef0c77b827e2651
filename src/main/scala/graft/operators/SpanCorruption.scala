package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic T5-style span-corruption pairs: mask a hash-selected
  * subset of token positions, emit the corrupted input (sentinels in
  * place of masked tokens) and the denoising target (the masked tokens,
  * in order) — the self-supervised objective construction step of an
  * encoder-decoder pretraining pipeline, made replayable: the mask is a
  * pure function of (doc id, position), so any engine — and the DuckDB
  * oracle — regenerates byte-identical pairs. (Real T5 additionally
  * merges ADJACENT masked positions into one numbered sentinel; this
  * operator keeps one sentinel per masked token so the construction
  * stays a pure per-token map on both engines.)
  *
  * 100 TB design: zero shuffles and zero explosion — the split, the
  * per-position mask decision, and both reassemblies are row-local
  * higher-order array expressions (`transform` with the index lambda,
  * `filter`, `array_join`), all inside whole-stage codegen. The token
  * stream never leaves its row, so the operator scales with scan
  * bandwidth alone.
  */
object SpanCorruption {

  /** True where position i of doc `id` is masked: md5(id:i) % every == 0. */
  private def maskedAt(id: Column, i: Column, every: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":"), i.cast("string"))
      .cast("binary")), 1, 15), 16, 10).cast("long") % every === 0

  /** Adds n_tokens, n_masked, input_text, target_text. Tokens are split
    * on single spaces (the fixture contract; pre-normalize whitespace
    * otherwise) so both engines see identical positions.
    */
  def corrupt(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", every: Int = 5,
      sentinel: String = "<X>"): DataFrame = {
    require(every >= 2, s"corrupt: every must be >= 2, got $every")
    val id = col(idCol)
    val toks = split(col(textCol), " ")
    val tagged = transform(toks, (tok, i) =>
      struct(tok.as("tok"), maskedAt(id, i, every).as("m")))
    docs
      .withColumn("_tagged", tagged)
      .withColumn("n_tokens", size(col("_tagged")).cast("long"))
      .withColumn("n_masked",
        size(filter(col("_tagged"), x => x.getField("m"))).cast("long"))
      .withColumn("input_text",
        array_join(transform(col("_tagged"),
          x => when(x.getField("m"), lit(sentinel)).otherwise(x.getField("tok"))), " "))
      .withColumn("target_text",
        array_join(transform(filter(col("_tagged"), x => x.getField("m")),
          x => x.getField("tok")), " "))
      .drop("_tagged")
  }
}
