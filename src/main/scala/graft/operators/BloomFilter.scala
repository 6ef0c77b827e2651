package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Bloom filter over a key column, and the runtime-filter
  * join shape built on it: build the filter on the SMALL (dimension)
  * side, broadcast it, and drop fact rows whose key cannot possibly
  * match BEFORE the join's shuffle. This is the row-level runtime
  * filtering Spark 3.3+ applies internally
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) made explicit,
  * so a pipeline can apply it where the optimizer's heuristics do not
  * reach (e.g. across a persisted boundary or a non-equi pre-filter).
  *
  * The bitmap is packed 32 bits per long word (bit 63 is never touched,
  * so the words stay positive and the same `<<`/`>>`/`&` arithmetic
  * replays in engines whose BIGINT shift overflows differently), and
  * the hash family is the same md5 split as [[CountMinSketch.cellHash]]
  * — the FILTER ITSELF is deterministic and externally checkable, not
  * just its false-positive rate.
  *
  * Scale shape (100 TB): the build is one map-side-combined `bit_or`
  * shuffle whose key space is m/32 words — constant output regardless
  * of input size; filters merge by word-wise OR. The probe side joins
  * the broadcast word table and never shuffles the fact rows; only
  * survivors reach the real join. No false negatives by construction.
  */
object BloomFilter {

  /** Build the filter: one row per non-empty word (widx, word), with
    * `k` bits set per key into `mBits` total bits. ≤ mBits/32 rows.
    */
  def build(df: DataFrame, keyCol: String, k: Int, mBits: Int): DataFrame = {
    require(k >= 1 && mBits >= 32 && mBits % 32 == 0, s"k=$k mBits=$mBits")
    df.select(explode(array((0 until k).map(j =>
        CountMinSketch.cellHash(col(keyCol), j, mBits)): _*)).as("pos"))
      .select((col("pos") / 32).cast("long").as("widx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("bit"))
      .groupBy(col("widx"))
      .agg(bit_or(col("bit")).as("word"))
  }

  /** Per-key membership flags for `probes` against a built filter:
    * (key, candidate boolean). candidate=false is definitive; true may
    * be a false positive. The word table is broadcast (constant size).
    */
  def mightContain(bloom: DataFrame, probes: DataFrame, keyCol: String,
      k: Int, mBits: Int): DataFrame = {
    val pos = probes.select(col(keyCol),
        explode(array((0 until k).map(j =>
          CountMinSketch.cellHash(col(keyCol), j, mBits)): _*)).as("pos"))
      .select(col(keyCol), (col("pos") / 32).cast("long").as("widx"),
        col("pos").mod(32).cast("int").as("bit"))
    pos
      .join(broadcast(bloom), Seq("widx"), "left")
      .groupBy(col(keyCol))
      .agg((count(lit(1)) === sum(when(
        expr("shiftright(coalesce(word, CAST(0 AS BIGINT)), bit) & 1") === 1, 1L)
        .otherwise(0L))).as("candidate"))
  }

  /** The runtime-filter join: inner-join `fact` to `dim`, but prune
    * fact rows through a Bloom filter on dim's keys first. Result is
    * row-identical to the plain join (no false negatives); the win is
    * that non-matching fact rows die at the scan instead of riding the
    * join shuffle.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, k: Int = 3, mBits: Int = 1 << 14): DataFrame = {
    val bloom = build(dim.select(col(dimKey)).distinct(), dimKey, k, mBits)
    val flags = mightContain(bloom, fact.select(col(factKey)).distinct(),
      factKey, k, mBits).filter(col("candidate")).drop("candidate")
    fact.join(broadcast(flags), factKey)
      .join(dim, col(factKey) === col(dimKey))
  }
}
