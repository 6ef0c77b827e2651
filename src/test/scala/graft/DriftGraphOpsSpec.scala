package graft

import graft.operators.{DupSourceMatrix, LabelPropagation, PsiDrift, TimeWeightedAverage}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Label propagation (X149), PSI drift (X150), TWAP (X151), duplicate
  * source matrix (X152).
  */
class DriftGraphOpsSpec extends SparkSpec {

  import spark.implicits._

  test("label propagation: hand-unrolled two synchronous rounds on bridged triangles") {
    // triangle 1-2-3, triangle 10-11-12, bridge 3-10
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (3L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val lbl = LabelPropagation.propagate(edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-unrolled: r1 = {1→2, 2→1, 3→1, 10→3, 11→10, 12→10};
    // r2: node 1 sees {1,1}→1; 2 sees {2,1}→1; 3 sees {2,1,3}→1;
    //     10 sees {1,10,10}→10; 11 sees {3,10}→3; 12 sees {3,10}→3
    assert(lbl === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 3L, 12L -> 3L))
    val sizes = LabelPropagation.communities(edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes === Map(1L -> 3L, 3L -> 2L, 10L -> 1L))
    assert(sizes.values.sum === 6L, "every node keeps exactly one label")
  }

  test("label propagation: edgesDistinct round-1 shortcut agrees with the join path") {
    // deterministic pseudo-random graph, both directions, no dup pairs
    val und = (1 to 400).map(i => ((i * 7L) % 37L, (i * 13L) % 41L + 37L)).distinct
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    for (rounds <- Seq(1, 2, 3)) {
      val slow = LabelPropagation.propagate(edges, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fast = LabelPropagation.propagate(edges, rounds, edgesDistinct = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast === slow, s"rounds=$rounds: shortcut path diverged")
    }
  }

  test("label propagation: long runs cross the periodic checkpoint boundary intact") {
    // 8 rounds > checkpointEvery=4 — exercises the persist-every-4th
    // cadence (two interior materializations + the final one)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val lbl = LabelPropagation.propagate(edges, rounds = 8, edgesDistinct = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.keySet === (1L to 7L).toSet)
    // a path graph under min-tie-break LPA converges toward label 1/2
    assert(lbl.values.forall(v => v >= 1L && v <= 7L))
    // and the result equals the slow path at the same round count
    val slow = LabelPropagation.propagate(edges, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl === slow)
  }

  test("PSI: identical cohorts give psi == 0; a shifted cohort does not") {
    val same = (1 to 200).flatMap(i => Seq((i * 13 % 100 / 100.0, true),
      (i * 13 % 100 / 100.0, false))).toDF("s", "base")
    val psi0 = PsiDrift.psiReport(same, "s", col("base"), 0.0, 1.0, 5)
      .select(max(abs(col("psi")))).as[Double].head()
    assert(psi0 < 1e-12, s"identical cohorts must have zero PSI, got $psi0")
    val shifted = ((1 to 100).map(i => (0.1, true)) ++ (1 to 100).map(i => (0.9, false)))
      .toDF("s", "base")
    val psi1 = PsiDrift.psiReport(shifted, "s", col("base"), 0.0, 1.0, 5)
      .select(max(col("psi"))).as[Double].head()
    assert(psi1 > 1.0, s"fully-shifted cohorts must show large PSI, got $psi1")
  }

  test("TWAP weights by holding time, not observation count") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // value 10 held 9s, value 100 held 1s -> twap (10*9 + 100*1)/10 = 19
    val ev = Seq((1L, ts(0), 10.0), (1L, ts(9), 100.0), (1L, ts(10), 7.0))
      .toDF("user_id", "ts", "value")
    val r = TimeWeightedAverage.twap(ev, "user_id", "ts", "value").collect()(0)
    assert(r.getAs[Long]("n_intervals") === 2)
    assert(r.getAs[Long]("span_us") === 10000000L)
    assert(r.getAs[Double]("twap") === 19.0)
  }

  test("dup source matrix: unordered pairs, diagonal included, uniques ignored") {
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "c b a", "s2"), (3L, "a b c a", "s2"),
      (4L, "x y", "s1"), (5L, "y x", "s1"),
      (6L, "only once", "s3")).toDF("doc_id", "text", "source")
    val m = DupSourceMatrix.matrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // docs 1,2,3 share fingerprint {a,b,c}; pairs (1,2)=s1s2 (1,3)=s1s2 (2,3)=s2s2
    // docs 4,5 share {x,y}: (4,5)=s1s1
    assert(m === Map(("s1", "s2") -> 2L, ("s2", "s2") -> 1L, ("s1", "s1") -> 1L))
  }

  test("TWAP plan: lead window and final agg reuse the one key shuffle") {
    val p = TimeWeightedAverage.twap(
        Tables.load(spark, TestSpark.sf0001, "events"), "user_id", "ts", "value")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "window + agg must ride one user_id shuffle:\n" + p)
  }
}
