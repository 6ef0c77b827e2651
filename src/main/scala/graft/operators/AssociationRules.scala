package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining (support / confidence / lift) —
  * the classic co-occurrence analysis over (basket, item) pairs:
  * which items appear together more often than chance. The retail
  * framing is canonical, but the same operator mines co-occurring
  * tags, co-edited files, co-clicked results, or co-citation in a
  * corpus. [[Collocations]] is the ADJACENCY version of this over
  * token streams; here co-occurrence is set membership per basket.
  *
  * Determinism: support and pair counts are exact longs; confidence
  * and lift divide those longs once at the end — hash-comparable.
  *
  * Scale shape (100 TB): the pair generation is a self-join ON THE
  * BASKET KEY — each basket of size d yields d(d-1)/2 pairs and never
  * leaves its partition group, so cost is Σd² per basket, not |items|².
  * `maxBasket` drops degenerate mega-baskets (a basket holding half
  * the catalog generates quadratic garbage and zero signal — the same
  * df-cap discipline as [[SparseSimilarity]]). The min-support cut
  * runs BEFORE the item-count joins, so only surviving pairs shuffle
  * twice more; top-k is a TakeOrderedAndProject.
  */
object AssociationRules {

  /** Top-`k` item pairs by lift among pairs with support ≥ `minSupport`.
    * Output: (rk int, item_a, item_b long, c_ab long, confidence
    * double r6 = P(b|a), lift double r6), lift-desc, ties on (a, b).
    *
    * Null contract: a null basket key forms its own basket (groupBy
    * keeps the null group); null items are ignored (collect_set drops
    * nulls) and do not count toward `maxBasket`.
    *
    * @param hotGuard 100 TB §5 guard (round 21): the default shape
    *   sizes each basket INSIDE the collect_set aggregation, so one
    *   degenerate mega-basket buffers its whole distinct-item set in a
    *   single aggregation row before the `maxBasket` filter can drop
    *   it. With `hotGuard = true`, basket sizes come from a
    *   bounded-memory distinct + count first and oversized baskets are
    *   anti-joined away BEFORE any collect_set runs — identical
    *   surviving baskets, identical counts (pinned by
    *   BasketPairsSpec), two extra exchanges. Off by default: bounded
    *   baskets (TPC-H: ≤ 7 items) don't need it and the default keeps
    *   the round-20 2-exchange plan.
    */
  def topLift(df: DataFrame, basketCol: String, itemCol: String,
      k: Int = 20, minSupport: Long = 3L, maxBasket: Int = 1000,
      hotGuard: Boolean = false): DataFrame = {
    // Round-20 shape (guide §2.4): ONE basket aggregation replaces the
    // old distinct + per-basket size aggregate + filter join + pair
    // SELF-JOIN — collect_set dedups (o, p) and sizes the basket in the
    // same exchange, the size cap becomes a row filter, and pairs
    // explode in-row from the sorted item array (d(d−1)/2 rows, pa < pb
    // by construction; same Σd² per-basket cost, two fewer exchanges
    // and no join). The basket table is eagerly localCheckpoint-ed
    // because three consumers scan it (basket count, item supports,
    // pair counts); round 21 switched it from persist() — which leaked
    // a CacheManager entry per call for library callers (round-20
    // advisor) — to a checkpoint whose blocks the ContextCleaner
    // reclaims; counts are bit-identical to the old shape.
    val base = ScanFanout.byKey(
      df.select(col(basketCol).as("o"), col(itemCol).as("p")), col("o"))
    val kept =
      if (!hotGuard)
        base.groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("_ps"))
          .filter(size(col("_ps")) <= maxBasket)
      else {
        // guard path: oversized basket IDS (few by definition — they are
        // the degenerate tail) from a bounded count, broadcast anti-join
        // before the set aggregation ever buffers them. count(p) skips
        // null items — the same null contract as collect_set — and the
        // distinct keeps an all-null basket's (o, null) row, so such a
        // basket still lands in nBaskets with an empty item set, exactly
        // as on the default path.
        val op = base.distinct()
        val over = op.groupBy(col("o")).agg(count(col("p")).as("_n"))
          .filter(col("_n") > maxBasket).select(col("o"))
        op.join(broadcast(over), Seq("o"), "left_anti")
          .groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("_ps"))
      }
    val baskets = kept.localCheckpoint(true)
    val nBaskets = baskets.agg(count(lit(1)).as("n_baskets"))
    val ci = baskets.select(explode(col("_ps")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c"))
    val pairs = baskets
      .select(explode(flatten(transform(col("_ps"), (x, i) =>
        transform(slice(col("_ps"), i + 2, size(col("_ps"))),
          y => struct(x.as("pa"), y.as("pb")))))).as("_pr"))
      .select(col("_pr.pa").as("pa"), col("_pr.pb").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSupport)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lift").desc, col("item_a").asc, col("item_b").asc)
    pairs
      .join(ci.select(col("p").as("pa"), col("c").as("c_a")), "pa")
      .join(ci.select(col("p").as("pb"), col("c").as("c_b")), "pb")
      .crossJoin(broadcast(nBaskets))
      .select(col("pa").as("item_a"), col("pb").as("item_b"), col("c_ab"),
        round(col("c_ab").cast("double") / col("c_a").cast("double"), 6).as("confidence"),
        round(col("c_ab").cast("double") * col("n_baskets").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double")), 6).as("lift"))
      .orderBy(col("lift").desc, col("item_a").asc, col("item_b").asc).limit(k)
      .withColumn("rk", row_number().over(w))
      .select(col("rk"), col("item_a"), col("item_b"), col("c_ab"),
        col("confidence"), col("lift"))
  }
}
