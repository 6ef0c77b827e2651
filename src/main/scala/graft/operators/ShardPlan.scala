package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Consistent-hash shard assignment and rebalancing plan: place every
  * row on a hash ring (md5-derived 60-bit positions, `vnodes` virtual
  * nodes per shard) and assign it to the clockwise-successor shard —
  * THE placement scheme that lets a 100 TB corpus grow its shard count
  * without reshuffling everything: adding a shard moves only the keys
  * that fall into the new shard's ring arcs (≈ 1/(n+1) of the data),
  * and the migration plan says exactly which rows those are BEFORE any
  * data moves.
  *
  * Everything is exact integer arithmetic on the same md5 family the
  * [[BloomFilter]]/[[CountMinSketch]] oracles replay, so assignments
  * and the migration matrix hash-check externally.
  *
  * Scale shape (100 TB): the ring is shards×vnodes rows — broadcast;
  * assignment is a map-side cross join against that constant-size
  * table plus one per-key min aggregate (no shuffle of row payloads,
  * only (id, position)); the migration matrix is a second tiny rollup.
  */
object ShardPlan {

  private def h(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** The vnode ring: (shard long, pos long), `vnodes` positions per
    * shard at md5("vn:shard:replica").
    */
  def ring(spark: SparkSession, nShards: Int, vnodes: Int): DataFrame = {
    require(nShards >= 1 && vnodes >= 1, s"nShards=$nShards vnodes=$vnodes")
    import spark.implicits._
    (0 until nShards).flatMap(s => (0 until vnodes).map(v => (s, v)))
      .toDF("shard", "replica")
      .select(col("shard").cast("long").as("shard"),
        h(concat_ws(":", lit("vn"), col("shard"), col("replica"))).as("pos"))
  }

  /** (id, shard long): each key to its clockwise-successor vnode
    * (smallest ring position ≥ the key's position, wrapping to the
    * globally smallest; position ties break to the smallest shard).
    */
  def assign(df: DataFrame, idCol: String, nShards: Int, vnodes: Int): DataFrame = {
    val r = ring(df.sparkSession, nShards, vnodes)
    df.select(col(idCol), h(concat_ws(":", lit("doc"), col(idCol))).as("_p"))
      .crossJoin(broadcast(r))
      .groupBy(col(idCol), col("_p"))
      .agg(
        min(when(col("pos") >= col("_p"), struct(col("pos"), col("shard")))).as("_succ"),
        min(struct(col("pos"), col("shard"))).as("_wrap"))
      .select(col(idCol), coalesce(col("_succ"), col("_wrap")).getField("shard").as("shard"))
  }

  /** Migration matrix for growing `nShards` → `newShards` (same vnode
    * count): (from_shard, to_shard, n_keys), ordered — diagonal rows
    * are the keys that stay put (≈ n/(n+1) of them, the whole point).
    */
  def rebalance(df: DataFrame, idCol: String, nShards: Int, newShards: Int,
      vnodes: Int): DataFrame = {
    require(newShards > nShards, s"rebalance: newShards=$newShards must exceed nShards=$nShards")
    val before = assign(df, idCol, nShards, vnodes)
      .select(col(idCol), col("shard").as("from_shard"))
    val after = assign(df, idCol, newShards, vnodes)
      .select(col(idCol), col("shard").as("to_shard"))
    before.join(after, idCol)
      .groupBy(col("from_shard"), col("to_shard"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy(col("from_shard"), col("to_shard"))
  }
}
