package graft.operators

import graft.expressions.BpeEncode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** End-to-end BPE tokenizer: a driver-loop FIT (each iteration one
  * distributed pair-count — the [[BpeMerges]] shape re-counted on the
  * current encoding, exactly a real BPE trainer's inner loop) and a
  * row-local APPLY ([[graft.expressions.BpeEncode]]). The fitted merge
  * list is a driver-side `Seq` compiled INTO the expression — at 100 TB
  * the list is a few thousand entries shipped once per executor inside
  * the serialized plan (a closure broadcast), and encoding is pure
  * map-side work: zero shuffle, whole-stage codegen around the
  * expression.
  */
object BpeApply {

  /** Fail fast on a merge list that is not training-consistent (a pair
    * mentioning a symbol before the merge that creates it): the
    * single-rank-ordered-pass apply is only equal to the reference
    * lowest-rank-first loop under this property. Single characters are
    * primitive symbols; anything longer must be produced by an earlier
    * merge.
    */
  def requireConsistent(merges: Seq[(String, String)]): Unit = {
    val produced = scala.collection.mutable.Set[String]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      Seq(a, b).foreach { s =>
        require(s.codePointCount(0, s.length) == 1 || produced.contains(s),
          s"bpe merges: rank $i pair ('$a','$b') uses symbol '$s' no earlier merge produces")
      }
      produced += (a + b)
    }
  }

  /** Column: `word` encoded with `merges` — final symbols space-joined. */
  def encodeCol(word: Column, merges: Seq[(String, String)]): Column = {
    requireConsistent(merges)
    Bridge.column(BpeEncode(Bridge.expression(word), merges))
  }

  /** True iterative BPE fit: `k` merges, each iteration re-counts
    * adjacent SYMBOL pairs on the corpus encoded with the merges fitted
    * so far and takes the most frequent (count desc, then (a, b) asc —
    * deterministic). Words are the whitespace tokens of `textCol`.
    * Cost: k jobs, each one map-side-combined groupBy over a small key
    * domain — the distributed profile of a real tokenizer trainer.
    */
  def fitMerges(docs: DataFrame, k: Int, textCol: String = "text"): Seq[(String, String)] = {
    val words = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    (0 until k).foreach { _ =>
      val enc =
        if (merges.isEmpty)
          // character split, space-joined — the primitive encoding
          words.select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("enc"))
        else words.select(encodeCol(col("w"), merges.toSeq).as("enc"))
      val best = enc
        .select(split(col("enc"), " ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("a"),
            element_at(col("syms"), i + 2).as("b")))).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("p.a"), col("p.b"))
        .limit(1)
        .collect()
      if (best.isEmpty) return merges.toSeq
      val row = best(0).getStruct(0)
      merges += ((row.getString(0), row.getString(1)))
    }
    merges.toSeq
  }

  /** Per-(doc, word) encoding of the first `maxWords` whitespace tokens:
    * (idCol, word_pos int 1-based, word, encoded, n_tokens long).
    */
  def encodeWords(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text",
      maxWords: Int = 5): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(slice(split(col(textCol), " "), 1, maxWords)).as(Seq("i", "word")))
      .filter(col("word") =!= "")
      .select(col(idCol), (col("i") + 1).as("word_pos"), col("word"),
        encodeCol(col("word"), merges).as("encoded"))
      .withColumn("n_tokens", size(split(col("encoded"), " ")).cast("long"))

  /** Token IDS from [[encodeWords]] output — what a trainer actually
    * consumes: vocab = every final symbol ranked by (count desc, symbol
    * asc) (deterministic, replayable), ids = the per-word symbol
    * sequence mapped through it, emitted as a csv string (engine-
    * portable). Output: (idCol, word_pos, ids_csv, n_tokens long).
    *
    * The vocab ranking is a GLOBAL row_number window — over the
    * vocab-sized aggregate only (distinct symbols, ≤ ~100k for real
    * tokenizers), never the corpus; the join back broadcasts it.
    */
  /** The deterministic fitted vocab of an [[encodeWords]] output —
    * (sym, tok_id long), ranked count desc then symbol asc. The ranking
    * window runs over the vocab-sized aggregate only (distinct symbols,
    * ≤ ~100k for real tokenizers), never the corpus.
    */
  def vocabOf(enc: DataFrame): DataFrame =
    enc.select(explode(split(col("encoded"), " ")).as("sym"))
      .groupBy(col("sym")).agg(count(lit(1)).as("cnt"))
      .withColumn("tok_id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("sym"))).cast("long"))
      .select(col("sym"), col("tok_id"))

  def tokenIds(enc: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val toks = enc.select(col(idCol), col("word_pos"),
      posexplode(split(col("encoded"), " ")).as(Seq("ti", "sym")))
    val vocab = vocabOf(enc)
    toks.join(broadcast(vocab), Seq("sym"))
      .groupBy(col(idCol), col("word_pos"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("ti"), col("tok_id")))),
          x => x.getField("tok_id").cast("string")), ",").as("ids_csv"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col(idCol), col("word_pos"))
  }

  /** DECODE closure — ids → text, the guarantee a trainer actually
    * needs from a tokenizer artifact: each id in `ids_csv` joins back
    * through the exported vocab (tok_id → sym) and the per-word symbol
    * sequence reassembles IN ORDER with no separator. BPE symbols
    * partition the word's characters, so `decoded_word` must equal the
    * encoder's input word exactly (pinned per-row by
    * `q_text_bpe_decode` and by the randomized
    * decode(encode(w)) == w property in `BpeApplySpec`).
    * Output: (idCol, word_pos, decoded_word, n_tokens long). The vocab
    * join broadcasts — decode is map-side except the per-word
    * reassembly groupBy.
    */
  def decodeIds(ids: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    ids
      .select(col(idCol), col("word_pos"),
        posexplode(split(col("ids_csv"), ",")).as(Seq("ti", "tid")))
      .select(col(idCol), col("word_pos"), col("ti"),
        col("tid").cast("long").as("tok_id"))
      .join(broadcast(vocab.select(col("tok_id"), col("sym"))), Seq("tok_id"))
      .groupBy(col(idCol), col("word_pos"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("ti"), col("sym")))),
          x => x.getField("sym")), "").as("decoded_word"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col(idCol), col("word_pos"))

  /** DuckDB oracle SQL fragments for the SAME merge list: a recursive
    * CTE that splices ONE merge occurrence per step, always the
    * lowest-rank pair present, leftmost occurrence first — the literal
    * reference BPE loop the single-pass apply must equal. Used by
    * `q_text_bpe_encode`'s oracle so Spark and DuckDB run IDENTICAL
    * merges.
    */
  def oracleCase(merges: Seq[(String, String)], s: String = "s"): (String, String) = {
    def pat(a: String, b: String) = s"' $a $b '"
    val whens = merges.map { case (a, b) =>
      s"WHEN position(${pat(a, b)} IN $s) > 0 THEN " +
        s"substr($s, 1, position(${pat(a, b)} IN $s) - 1) || ' ${a + b} ' || " +
        s"substr($s, position(${pat(a, b)} IN $s) + ${a.length + b.length + 3})"
    }
    val anyPos = merges.map { case (a, b) => s"position(${pat(a, b)} IN $s) > 0" }
      .mkString(" OR ")
    (s"CASE ${whens.mkString(" ")} ELSE $s END", anyPos)
  }
}
