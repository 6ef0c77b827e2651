package graft

import graft.operators.Winnowing
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (X183): the MOSS guarantees — any match of
  * length >= w + k - 1 tokens shares a fingerprint, density is bounded,
  * the rightmost-min tie rule holds, and the selection is partition-
  * invariant (pure function of the text).
  */
class WinnowingSpec extends SparkSpec {

  import spark.implicits._

  private val k = 3
  private val w = 4

  test("guarantee: a shared span of w + k - 1 tokens yields a shared fingerprint") {
    // the shared span is exactly w + k - 1 = 6 tokens long
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three four $shared five six seven eight"),
      (2L, s"red orange yellow $shared green blue indigo violet nine")
    ).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "doc_id", "text", k, w)
    val a = fp.filter($"id" === 1L).select("h").as[Long].collect().toSet
    val b = fp.filter($"id" === 2L).select("h").as[Long].collect().toSet
    assert(a.intersect(b).nonEmpty,
      s"docs sharing a ${w + k - 1}-token span must share a fingerprint: $a vs $b")
    assert(Winnowing.candidatePairs(docs, "doc_id", "text", k, w, minShared = 1)
      .count() === 1L)
  }

  test("density: fingerprints are a strict subset of gram positions, every window covered") {
    val text = (1 to 60).map(i => s"tok${i % 23}").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "doc_id", "text", k, w).collect()
    val nGrams = 60 - k + 1
    val nWindows = nGrams - w + 1
    assert(fp.length < nGrams, "selection must be sparser than the gram stream")
    assert(fp.length >= nWindows / w,
      "every window selects something, so density is at least 1/w")
    // every complete window [p-w+1, p] must contain a selected position
    val positions = fp.map(_.getAs[Int]("pos")).toSet
    ((w - 1) until nGrams).foreach { p =>
      assert((p - w + 1 to p).exists(positions.contains),
        s"window ending at $p has no fingerprint")
    }
  }

  test("tie rule: identical gram hashes select the rightmost position per window") {
    // one repeated token → every gram identical → every window's min is
    // its rightmost position → all complete-window positions selected
    val docs = Seq((1L, Seq.fill(10)("same").mkString(" "))).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "doc_id", "text", k, w)
    val positions = fp.select("pos").as[Int].collect().toSet
    val nGrams = 10 - k + 1
    assert(positions === ((w - 1) until nGrams).toSet,
      s"rightmost-min must select every window-end position, got $positions")
  }

  test("partition invariance: the fingerprint set is a pure function of the text") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val one = Winnowing.fingerprints(docs.repartition(1), "doc_id", "text", 5, 8)
    val many = Winnowing.fingerprints(docs.repartition(13), "doc_id", "text", 5, 8)
    assert(one.exceptAll(many).isEmpty && many.exceptAll(one).isEmpty)
  }

  test("short documents (< k + w - 1 tokens) yield no fingerprints, not errors") {
    val docs = Seq((1L, "a b"), (2L, "a b c d e")).toDF("doc_id", "text")
    assert(Winnowing.fingerprints(docs, "doc_id", "text", k, w).count() === 0L)
  }
}
