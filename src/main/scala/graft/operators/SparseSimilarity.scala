package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sparse-vector (TF-IDF) cosine similarity join over documents — the
  * lexical complement to the embedding near-dup path in [[Dedup]]: pairs
  * are generated ONLY through shared terms (word n-gram shingles), so
  * the cost is Σ df² over terms, never |docs|² — the standard
  * "similarity join via inverted index" shape (prefix-filtering family).
  *
  * 100 TB design:
  *  - a document-frequency cap drops terms too common to be
  *    discriminative BEFORE the pair-generating self-join (a term in d
  *    docs yields d² pair rows; boilerplate would dominate otherwise) —
  *    aggregated df + broadcast anti-join, same discipline as
  *    [[Dedup.ngramJaccardPairs]]. Cosine is then defined in the capped
  *    term space, which is also what an inverted-index implementation
  *    ships: stop-terms never enter the index.
  *  - weights are FIXED-POINT integers (`round(tfidf · 2^16)`), so dots
  *    and squared norms are exact long sums: order-free, map-side
  *    combinable partial aggregation on the pair key instead of a
  *    collect-and-fold (which shuffles every pair row with its term
  *    string and builds per-pair arrays — measured 2.4× slower at
  *    sf0.1). Same bit-exact-integer-score discipline as the int8 SDC
  *    ranking in [[SimilaritySearch]]. ANSI mode makes any overflow
  *    loud; headroom is ~2^63 / (maxW·2^16)² shared terms per pair.
  *  - the (doc, term, weight) projection is persisted: it feeds the norm
  *    aggregation and both sides of the pair join.
  */
object SparseSimilarity {

  /** TF-IDF cosine pairs with `cos ≥ threshold` over word `n`-gram terms.
    *
    * Output: (id_a, id_b, n_common int — shared distinct terms,
    * cos double rounded 4), id_a < id_b. Cosine is computed over the
    * fixed-point (2^16) quantized weight vectors — deterministic across
    * engines and re-runs by construction.
    */
  def cosinePairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.3,
      maxTermDf: Int = 100, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scale = 1L << 16
    // fan out before tokenize/shingle/explode (guide §2.5): the term
    // generation + tf partial aggregation otherwise run fused onto the
    // one-task scan of a single-row-group parquet file.
    // tf IS persisted (round 21): the fan-out exchange satisfies the
    // (doc_id, term) aggregation without a shuffle, so the pre-round-20
    // ReusedExchange sharing no longer exists and the round-20 plan
    // recomputed the tokenize+shingle Generate subtree THREE times (the
    // anti-join side, the df>cap broadcast side, the df-attach join
    // side — all reading the parquet scan separately). One cache fill
    // removes two full shingle passes (guide §2.4).
    val tf = ScanFanout.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), explode(TextFunctions.shinglesFromTokens(col("_toks"), n)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val overCap = dfreq.filter(col("df") > maxTermDf).select(col("term"))
    val nDocs = docs.count().toDouble
    // persist: weights feed BOTH pair-join sides. The squared norm rides
    // ON the weight rows (a window over the cache's own doc_id
    // partitioning — no exchange, no join): the round-20 shape joined a
    // separate norm aggregate back onto the PAIR table twice, i.e. two
    // re-shuffles of the largest frame in the query at scale (the pair
    // key space is Σdf² ≫ docs); carrying 8 bytes per weight row through
    // the term shuffle instead is guide §2.3 "shuffle keys and metadata,
    // not payload re-joins". max(nrm2) per pair side is exact: every row
    // of a pair group carries that side's single norm value.
    val w = tf.join(broadcast(overCap), Seq("term"), "left_anti")
      .join(dfreq, Seq("term"))
      .select(col("doc_id"), col("term"),
        floor(col("tf") * log(lit(nDocs) / col("df")) * scale).as("wq"))
      .withColumn("nrm2", sum(col("wq") * col("wq"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      // persist PARTITIONED BY THE PAIR-JOIN KEY (round 21, guide §2.4
      // "two operations keyed the same way share one exchange"): the
      // norm window above rides the upstream doc_id clustering, then
      // one exchange at fill time replaces the TWO term exchanges the
      // self-join otherwise pays on every scan of the cache
      .repartition(col("term"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // exact long sums — plain aggregates, partial-aggregated map-side
    val dots = w.as("a").hint("shuffle_hash")
      .join(w.as("b"), col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (col("a.wq") * col("b.wq")).as("part"),
        col("a.nrm2").as("nrm2_a"), col("b.nrm2").as("nrm2_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("int").as("n_common"), sum(col("part")).as("dot"),
        max(col("nrm2_a")).as("nrm2_a"), max(col("nrm2_b")).as("nrm2_b"))
    dots
      .withColumn("cos", col("dot").cast("double")
        / (sqrt(col("nrm2_a").cast("double")) * sqrt(col("nrm2_b").cast("double"))))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"), round(col("cos"), 4).as("cos"))
  }
}
