package graft

import graft.operators.{BlockingAudit, ShardPlan}
import org.apache.spark.sql.functions._

/** Consistent-hash shard plan (X166) and blocking-quality audit (X167). */
class ShardBlockingSpec extends SparkSpec {

  import spark.implicits._

  test("shard assignment is total, deterministic, and roughly balanced") {
    val ids = (1L to 1000L).toDF("id")
    val a = ShardPlan.assign(ids, "id", nShards = 4, vnodes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size === 1000, "every key assigned")
    assert(a.values.toSet.subsetOf((0L until 4L).toSet))
    val sizes = a.values.groupBy(identity).map(_._2.size)
    assert(sizes.min > 50, s"no shard starves: $sizes") // vnode-smoothed balance
    // replay: same assignment on a second run
    val b = ShardPlan.assign(ids, "id", nShards = 4, vnodes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("growing the ring moves only keys bound for the new shard") {
    val ids = (1L to 1000L).toDF("id")
    val plan = ShardPlan.rebalance(ids, "id", nShards = 4, newShards = 5, vnodes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val moved = plan.collect { case ((f, t), n) if f != t => ((f, t), n) }
    // the consistent-hashing contract: every move lands ON the new shard
    assert(moved.keys.forall(_._2 == 4L), s"moves only into shard 4: $moved")
    val nMoved = moved.values.sum
    val total = plan.values.sum
    assert(total === 1000L)
    assert(nMoved < total / 2, s"minor fraction moves (expected ~1/5): $nMoved")
    assert(nMoved > 0, "the new shard takes ownership of something")
  }

  test("blocking audit: perfect key has completeness 1; degenerate key has RR 0") {
    val df = Seq(
      ("e1", "b1"), ("e1", "b1"), ("e2", "b1"), ("e2", "b2"), ("e3", "b3")
    ).toDF("truth", "block")
    val r = BlockingAudit.audit(df, col("block"), col("truth")).head()
    // pairs: total = 10; blocks: b1 has 3 -> 3 pairs; truth: e1(2)+e2(2) -> 2;
    // covered: (e1,b1)=2 -> 1 pair; e2 split across blocks -> lost
    assert(r.getAs[Long]("n_pairs") === 10L)
    assert(r.getAs[Long]("n_cand_pairs") === 3L)
    assert(r.getAs[Long]("n_true_pairs") === 2L)
    assert(r.getAs[Long]("n_covered") === 1L)
    assert(r.getAs[Double]("reduction_ratio") === 0.7)
    assert(r.getAs[Double]("completeness") === 0.5)
    // blocking on the truth key itself: completeness 1
    val perfect = BlockingAudit.audit(df, col("truth"), col("truth")).head()
    assert(perfect.getAs[Double]("completeness") === 1.0)
    // a constant block key eliminates nothing
    val degenerate = BlockingAudit.audit(df, lit("all"), col("truth")).head()
    assert(degenerate.getAs[Double]("reduction_ratio") === 0.0)
    assert(degenerate.getAs[Double]("completeness") === 1.0)
  }
}
