package graft.operators

import graft.expressions.CharKmerExplode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte/char-level EXACT-substring deduplication — the
  * deduplicate-text-datasets / RefinedWeb exact recipe, at character
  * granularity (the word-8-gram [[DupNgrams]] approximates it at token
  * granularity). A duplicated SPAN is a maximal character range covered
  * by k-mers that occur at least `minCount` times corpus-wide; the
  * output offsets replay with `substr(text, span_start + 1, span_len)`
  * in both Spark and DuckDB, so a removal pass is a pure string
  * operation downstream.
  *
  * Scale shape (100 TB): the k-mer stream is O(total characters) rows
  * but each is (id, pos, key) narrow; it flows into one map-side-
  * combined groupBy for the duplicate-k-mer table, one semi-join back,
  * and one per-document window for the island merge — cost O(total
  * bytes), never O(docs²), exactly like the suffix-array construction
  * it replaces (sorted k-mer runs ARE the suffix array truncated at
  * depth k). `byHash = true` shuffles 8-byte xxhash64 keys instead of
  * k-char grams — the at-scale mode (k× less shuffle I/O) with a
  * 2⁻⁶⁴-per-pair false-dup-seed risk; `byHash = false` is exact and is
  * what the DuckDB oracle checks. `DupSpansSpec` pins the two modes
  * equal on the test corpus and replays every span.
  */
object DupSpans {

  /** One row per character offset: (idCol, pos int, kmer string). */
  def kmers(docs: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val gen = Bridge.column(CharKmerExplode(Bridge.expression(col(textCol)), k))
    // fan out before the per-character k-mer explosion (guide §2.5)
    ScanFanout.byKey(docs.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol), gen.as(Seq("pos", "kmer")))
  }

  /** Maximal duplicated spans: (idCol, span_start long, span_end long
    * — exclusive, span_len long, n_seeds long) ordered by (id, start).
    * Seeds at positions p1 < p2 merge into one span when p2 <= p1 + k
    * (their k-char windows overlap or touch — the covered text is
    * contiguous).
    */
  def spans(docs: DataFrame, k: Int, minCount: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text",
      byHash: Boolean = false): DataFrame = {
    val g = kmers(docs, k, idCol, textCol)
    val key: Column = if (byHash) xxhash64(col("kmer")) else col("kmer")
    val keyed = g.select(col(idCol), col("pos"), key.as("kkey"))
    // total occurrences, not distinct docs: a string repeated inside ONE
    // document is duplicated text too (same rule as the suffix-array
    // recipe). Duplicate detection is a count window over the k-mer key:
    // the corpus-sized stream is generated ONCE and shuffled ONCE
    // (+sort), where a groupBy+semi-join shape generates it twice and
    // shuffles it twice (partial aggregation buys nothing on
    // mostly-unique grams) — measured 2.3× faster at sf0.1 and one
    // full-stream exchange cheaper at any scale. Caveat: a pathological
    // gram duplicated 10⁹ times buffers one window partition (spill,
    // not failure); `byHash` narrows the shuffled key to 8 bytes for
    // the at-scale run.
    val seeds = keyed
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col("kkey"))))
      .filter(col("__cnt") >= minCount)
      .select(col(idCol), col("pos"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val islanded = seeds
      .withColumn("__prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("__new_island",
        when(col("__prev").isNull || col("pos") > col("__prev") + k, 1).otherwise(0))
      .withColumn("__island",
        sum(col("__new_island")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    islanded.groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k).cast("long").as("span_end"),
        count(lit(1)).as("n_seeds"))
      .withColumn("span_len", col("span_end") - col("span_start"))
      .select(col(idCol), col("span_start"), col("span_end"), col("span_len"),
        col("n_seeds"))
      .orderBy(col(idCol), col("span_start"))
  }

  /** The REMOVE half of the recipe: splice every duplicated span out of
    * the text (spans are disjoint and sorted by construction — islands
    * are separated by gaps > k). Removal is total — both copies go, the
    * deduplicate-text-datasets default; "keep one occurrence" is a
    * policy layer above (pick a canonical doc first, X174-style).
    * Output: one row per INPUT doc — (idCol, washed_text, n_spans long,
    * removed_chars long); span-less docs pass through verbatim.
    *
    * The splice is a row-local higher-order `aggregate` over the doc's
    * own (few) spans — no extra shuffle beyond [[spans]]' per-doc
    * grouping.
    */
  def removeSpans(docs: DataFrame, k: Int, minCount: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text",
      byHash: Boolean = false): DataFrame = {
    val sp = spans(docs, k, minCount, idCol, textCol, byHash)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_end"))))
          .as("__spans"))
    val emptySpans = array().cast("array<struct<span_start:bigint,span_end:bigint>>")
    docs.filter(col(textCol).isNotNull)
      .join(sp, Seq(idCol), "left")
      .withColumn("__spans", coalesce(col("__spans"), emptySpans))
      .withColumn("__acc", aggregate(col("__spans"),
        struct(lit("").as("w"), lit(0L).as("prev")),
        (acc, s) => struct(
          concat(acc("w"), col(textCol).substr(
            (acc("prev") + 1).cast("int"),
            (s("span_start") - acc("prev")).cast("int"))).as("w"),
          s("span_end").as("prev")),
        acc => concat(acc("w"), col(textCol).substr(
          (acc("prev") + 1).cast("int"), length(col(textCol))))))
      .select(col(idCol),
        col("__acc").as("washed_text"),
        size(col("__spans")).cast("long").as("n_spans"),
        (length(col(textCol)) - length(col("__acc"))).cast("long").as("removed_chars"))
      .orderBy(col(idCol))
  }
}
