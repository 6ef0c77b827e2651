package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: assign documents to
  * fixed token-budget bins ("pack 4k-token training sequences"). Each
  * document starts at the running token total of its predecessors and
  * lands in bin `floor(start / budget)` — documents may straddle a bin
  * boundary, the standard packed-pretraining layout (the trainer masks
  * attention across the boundary).
  *
  * Scale shape: a single global running sum would serialize the corpus
  * through one partition, so packing is SHARD-PARALLEL — documents are
  * split across `nShards` by a deterministic modulo of the id and packed
  * independently within each shard (bin identity = (shard, bin)). The
  * cumulative sum is a window per shard: with ids uniformly sharded,
  * each partition carries corpus/nShards rows, and nShards scales with
  * the cluster. Deterministic: modulo sharding + id ordering, no rand —
  * an external engine can replay the exact assignment.
  */
object CorpusPacking {

  /** @return (idCol, n_tokens, shard, bin, start_tok) — one row per doc. */
  def packByTokenBudget(docs: DataFrame, idCol: String, nTokensCol: String,
      budgetTokens: Long, nShards: Int = 256): DataFrame = {
    require(budgetTokens > 0 && nShards > 0, "budget and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(nTokensCol).cast("long").as("n_tokens"),
        pmod(col(idCol).cast("long"), lit(nShards.toLong)).as("shard"))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("start_tok") / budgetTokens))
  }
}
