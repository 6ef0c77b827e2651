package graft

import graft.operators.{AssociationRules, BasketPairs}
import org.apache.spark.sql.functions._

/** Round-21 §5 guard: oversized ("hot") baskets must never materialize
  * their whole item set in one aggregation row nor their d(d−1)/2 pair
  * explosion in one task — and the guarded paths must count exactly
  * what the default in-row paths count.
  */
class BasketPairsSpec extends SparkSpec {

  import spark.implicits._

  // 3 bounded baskets + one 500-item hot basket (with dup rows to
  // exercise the dedup) — pair counts must be identical on every path.
  private lazy val items = {
    val small = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (3L, 20L), (3L, 20L))
    val hot = (0 until 500).map(i => (9L, 1000L + i)) ++ Seq((9L, 1000L)) // dup
    (small ++ hot).toDF("o", "p")
  }

  test("guarded pairs equal in-row pairs on a synthetic hot basket") {
    val inRow = BasketPairs.pairsPerBasket(items, "o", "p", None)
      .groupBy("u", "v").count()
    val guarded = BasketPairs.pairsPerBasket(items, "o", "p", Some(100))
      .groupBy("u", "v").count()
    val diff = inRow.unionByName(guarded)
      .groupBy("u", "v", "count").agg(count(lit(1)).as("n"))
      .filter(col("n") =!= 2)
    assert(diff.isEmpty, "guarded path must produce identical pair counts")
    // distinct pairs: 3 (basket 1) + 124750 (hot basket) — basket 2's
    // single pair (10,11) coincides with one of basket 1's
    assert(guarded.count() === 3L + (500L * 499L) / 2L)
  }

  test("guarded plan generates hot-basket pairs without a collect_set blowup") {
    // with the threshold below every basket, NO basket may take the
    // in-row path: the plan must contain no collect_set aggregation
    // feeding the hot branch's rows (the salted self-join replaces it)
    val allHot = BasketPairs.pairsPerBasket(items, "o", "p", Some(1))
    val salted = allHot.queryExecution.executedPlan.toString
    assert(salted.contains("Join"), "hot path must pair via the salted self-join")
    // the in-row branch still exists in the union but receives zero
    // baskets; the guard property is that rows above the threshold are
    // anti-joined away BEFORE any set aggregation:
    val rows = allHot.groupBy("u", "v").count()
    // (10,11) occurs in baskets 1 AND 2; every other pair exactly once
    assert(rows.filter(col("count") =!= 1).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) === Seq((10L, 11L, 2L)))
    assert(rows.count() === 3L + (500L * 499L) / 2L)
  }

  test("topLift hotGuard counts match the default path") {
    val base = AssociationRules.topLift(items, "o", "p", k = 10,
      minSupport = 1L, maxBasket = 400)
    val guarded = AssociationRules.topLift(items, "o", "p", k = 10,
      minSupport = 1L, maxBasket = 400, hotGuard = true)
    // maxBasket = 400 drops the 500-item basket on BOTH paths — the
    // guard drops it before any collect_set buffers it
    assert(base.collect().toSeq === guarded.collect().toSeq)
    val guardedPlan = guarded.queryExecution.executedPlan.toString
    assert(guardedPlan.contains("Join"), "guard path must pre-size via anti-join")
  }
}
