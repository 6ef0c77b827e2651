package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines, all as
  * native column expressions (split / higher-order functions / regexp /
  * hash built-ins) so they run inside whole-stage codegen with no UDF or
  * Python-worker boundary — the property that makes them viable over
  * billions of documents.
  */
object TextFunctions {

  /** Whitespace tokens (lowercased). */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: words, single digits, punctuation runs —
    * the usual cheap proxy for LLM token counts.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of non-alphanumeric, non-space chars to all chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
        length(text).cast("double"))

  /** Fraction of tokens that appear in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => t.isInCollection(stopwords))).cast("double") /
        size(toks).cast("double"))
  }

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite [0,1] quality score from length / punctuation / stopword
    * signals (heuristic, in the spirit of C4/Gopher filtering rules).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthOk = when(nTok >= 10 && nTok <= 10000, lit(1.0)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) <= 0.2, lit(1.0)).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(text, stopwords) >= 0.05, lit(1.0)).otherwise(lit(0.0))
    val meanLenOk = when(meanTokenLength(text).between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    (lengthOk + punctOk + stopOk + meanLenOk) / 4
  }

  /** Canonical content fingerprint: md5 of the sorted distinct token set.
    * Robust to word order / duplication — the classic "fingerprint dedup".
    */
  def tokenSetFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " ").cast("binary"))

  /** Word n-gram shingles from an ALREADY-MATERIALIZED token-array
    * column. Callers must bind the token array to a real column (a
    * projection boundary) first: passing `tokens(text)` directly makes
    * the lambda's `slice` capture the unprojected split() expression,
    * which then re-evaluates the regex once PER SHINGLE — measured 4-6 s
    * of a 9 s query at sf0.1 (the same re-inlining trap as round 1's
    * langId). Empty array when fewer than n tokens.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Word n-gram shingles of a text column — only safe where the row
    * count is small or the expression is used once; hot paths should
    * project `tokens(text)` and use `shinglesFromTokens`.
    */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)

  /** SimHash of the token multiset: 64-bit fingerprint where bit i is the
    * sign of the sum over tokens of (bit i of xxhash64(token) ? +1 : -1).
    * Near-duplicate texts differ in few bits (compare via hamming).
    */
  def simHash64(text: Column, nBits: Int = 64): Column = {
    val toks = tokens(text)
    val bits = (0 until nBits).map { i =>
      val contrib = aggregate(toks, lit(0L),
        (acc, t) => acc + when((shiftright(xxhash64(t), i).bitwiseAND(1L)) === 1L, 1L).otherwise(-1L))
      when(contrib > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Language-ID scores: counts of language-distinctive stopwords.
    * A deliberately simple, deterministic n-gram/stopword heuristic —
    * good enough to route documents, trivially auditable, SQL-portable.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq("的", "是", "和"))

  /** Marker count from an ALREADY-TOKENIZED column — callers scoring
    * several languages should project `tokens(text)` once and score from
    * that column, so the document is regex-tokenized once, not once per
    * language (the round-1 bench paid 5-6× re-tokenization here).
    */
  def langScoreFromTokens(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(langMarkers(lang))))

  def langScore(text: Column, lang: String): Column =
    langScoreFromTokens(tokens(text), lang)

  /** Predicted language from a pre-tokenized column: argmax of marker
    * counts; ties pick the alphabetically-first language code; "und" when
    * all scores are zero.
    */
  def langIdFromTokens(toks: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    // max over struct(score, priority): priority descends with code order,
    // so equal scores resolve to the alphabetically-first code.
    val scored = langs.zipWithIndex.map { case (l, i) =>
      struct(langScoreFromTokens(toks, l).as("score"),
        lit(langs.length - i).as("prio"), lit(l).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** PII scrubbing patterns — kept to RE2-compatible syntax (no
    * backreferences / lookaround) so external engines replay them
    * identically.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longDigitsRe = "[0-9]{6,}"

  /** Number of matches of `re` in the text. */
  def matchCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Text with emails replaced by `<EMAIL>` then long digit runs (6+,
    * i.e. phone/account/SSN-shaped) by `<NUM>` — order matters, the email
    * pass must see the original local parts. Pure codegen'd regexps: the
    * scrub runs in the scan projection at corpus scale.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), longDigitsRe, "<NUM>")
}
