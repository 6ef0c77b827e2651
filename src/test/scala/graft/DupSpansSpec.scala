package graft

import graft.operators.DupSpans
import org.apache.spark.sql.functions._

/** Byte-level exact-substring dedup: spans checked against a brute-force
  * in-memory reference on crafted corpora (cross-doc copy, within-doc
  * repetition), replayability of the offsets, and hash-key mode ≡
  * exact-key mode on the fixture corpus.
  */
class DupSpansSpec extends SparkSpec {

  import spark.implicits._

  /** Obviously-correct reference: count every k-substring corpus-wide,
    * mark positions whose window occurs >= minCount times, merge runs
    * (gap > k splits).
    */
  private def reference(docs: Seq[(Long, String)], k: Int, minCount: Int)
      : Seq[(Long, Long, Long)] = {
    val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    docs.foreach { case (_, t) =>
      (0 to t.length - k).foreach(i => counts(t.substring(i, i + k)) += 1)
    }
    docs.flatMap { case (id, t) =>
      val seeds = (0 to t.length - k).filter(i => counts(t.substring(i, i + k)) >= minCount)
      val spans = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var start = -1; var last = -1
      seeds.foreach { p =>
        if (start < 0) { start = p; last = p }
        else if (p > last + k) { spans += ((id, start.toLong, (last + k).toLong)); start = p; last = p }
        else last = p
      }
      if (start >= 0) spans += ((id, start.toLong, (last + k).toLong))
      spans.toSeq
    }
  }

  private def run(docs: Seq[(Long, String)], k: Int, byHash: Boolean = false)
      : Seq[(Long, Long, Long)] =
    DupSpans.spans(docs.toDF("doc_id", "text"), k = k, byHash = byHash)
      .select($"doc_id", $"span_start", $"span_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("cross-document copied paragraph: spans == brute-force reference") {
    val docs = Seq(
      1L -> "aaaa THE QUICK BROWN FOX JUMPED OVER THE LAZY DOG bbbb unique tail one",
      2L -> "cccc THE QUICK BROWN FOX JUMPED OVER THE LAZY DOG dddd other ending xx",
      3L -> "entirely original content with no shared twenty-char run at all 12345")
    Seq(10, 20).foreach { k =>
      assert(run(docs, k).sorted === reference(docs, k, 2).sorted, s"k=$k")
    }
  }

  test("WITHIN-document repetition counts as duplication (suffix-array rule)") {
    val docs = Seq(
      1L -> ("spam ham " * 12 + "and then something original here"),
      2L -> "totally unrelated second document body")
    val got = run(docs, 8)
    assert(got === reference(docs, 8, 2).sorted)
    assert(got.exists { case (id, s, e) => id == 1L && e - s >= 8 * 9 },
      s"the repeated prefix must merge into one long span: $got")
  }

  test("offsets replay: every span char is covered by a duplicated k-window, " +
      "and the span edges are duplicated windows") {
    val docs = Seq(
      1L -> "zzz COPY ME PLEASE COPY ME PLEASE qqq",
      2L -> "www COPY ME PLEASE end")
    val k = 6
    val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    docs.foreach { case (_, t) =>
      (0 to t.length - k).foreach(i => counts(t.substring(i, i + k)) += 1) }
    val byId = docs.toMap
    val got = run(docs, k)
    assert(got.nonEmpty)
    got.foreach { case (id, s, e) =>
      val t = byId(id)
      val dupWindows = (s.toInt to e.toInt - k)
        .filter(p => counts(t.substring(p, p + k)) >= 2)
      // edges: a span starts and ends ON duplicated windows (offsets are
      // tight, not padded)
      assert(dupWindows.headOption.contains(s.toInt), s"span [$s,$e) doc $id start")
      assert(dupWindows.lastOption.contains(e.toInt - k), s"span [$s,$e) doc $id end")
      // coverage: every char of the span lies under >= 1 duplicated
      // window (merged islands may contain non-duplicated BRIDGING
      // windows, but never uncovered characters)
      val covered = dupWindows.flatMap(p => p until p + k).toSet
      assert((s.toInt until e.toInt).forall(covered),
        s"span [$s,$e) doc $id has uncovered chars")
    }
  }

  test("hash-key (at-scale) mode == exact-key mode on the fixture corpus") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val exact = run(docs, 20, byHash = false).sorted
    val hashed = run(docs, 20, byHash = true).sorted
    assert(exact === hashed)
    assert(exact.nonEmpty, "fixture corpus should contain duplicated 20-char runs")
  }

  test("removeSpans splices exactly the spans out; span-less docs pass through") {
    val docs = Seq(
      1L -> "aaaa THE QUICK BROWN FOX JUMPED OVER THE LAZY DOG bbbb unique tail one",
      2L -> "cccc THE QUICK BROWN FOX JUMPED OVER THE LAZY DOG dddd other ending xx",
      3L -> "entirely original content with no shared twenty-char run at all 12345")
    val k = 10
    val expectedSpans = reference(docs, k, 2).groupBy(_._1)
    val got = graft.operators.DupSpans.removeSpans(docs.toDF("doc_id", "text"), k)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === docs.map(_._1).toSet, "one row per input doc")
    docs.foreach { case (id, text) =>
      val spans = expectedSpans.getOrElse(id, Seq()).sortBy(_._2)
      val washed = {
        val sb = new StringBuilder
        var prev = 0L
        spans.foreach { case (_, s, e) =>
          sb.append(text.substring(prev.toInt, s.toInt)); prev = e
        }
        sb.append(text.substring(prev.toInt)); sb.toString
      }
      val (w, n, removed) = got(id)
      assert(w === washed, s"doc $id")
      assert(n === spans.size.toLong)
      assert(removed === spans.map { case (_, s, e) => e - s }.sum)
    }
    assert(got(3L)._1 === docs.toMap.apply(3L), "no spans -> verbatim")
  }

  test("supplementary-plane text: offsets are code points, replay + splice stay exact") {
    // mirrors BpeApplySpec's unicode case: each emoji is TWO UTF-16 code
    // units but ONE code point — UTF-16 indexing would shift every span
    // after it and make the splice cut the wrong characters
    val docs = Seq(
      1L -> "😀😀 THE QUICK BROWN FOX JUMPS xx tail one 😀",
      2L -> "yy THE QUICK BROWN FOX JUMPS zz other end")
    val k = 10
    val df = docs.toDF("doc_id", "text")
    // the generator itself: positions count code points, k-mers never
    // split a surrogate pair
    val kmers = DupSpans.kmers(df, k)
      .filter($"doc_id" === 1L)
      .select($"pos", $"kmer").collect().map(r => (r.getInt(0), r.getString(1)))
    val t1 = docs.head._2
    val cps = t1.codePoints().toArray
    assert(kmers.length === cps.length - k + 1, "one k-mer per CODE POINT offset")
    kmers.foreach { case (p, km) =>
      assert(km.codePointCount(0, km.length) === k, s"k-mer at $p must hold $k code points")
      assert(km === new String(cps, p, k), s"k-mer at $p replays by code-point slice")
    }
    // spans replay identically through Spark's (code-point-addressed)
    // substr on both docs — the shared run is byte-identical
    val replayed = DupSpans.spans(df, k)
      .join(df, Seq("doc_id"))
      .select($"doc_id", expr("substr(text, cast(span_start as int) + 1, " +
        "cast(span_end - span_start as int))").as("run"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(replayed(1L) === replayed(2L),
      s"replayed spans must agree across docs: $replayed")
    assert(replayed(1L).contains("QUICK BROWN FOX"))
    // and the wash splices the right characters: emoji survive, the
    // duplicated run does not
    val washed = DupSpans.removeSpans(df, k)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!washed(1L).contains("QUICK") && !washed(2L).contains("QUICK"))
    assert(washed(1L).startsWith("😀😀") && washed(1L).endsWith("😀"),
      s"characters outside the span are untouched: ${washed(1L)}")
  }

  test("docs shorter than k yield no k-mers; null text is skipped") {
    val df = Seq((1L, Some("tiny")), (2L, None), (3L, Some("x" * 30)))
      .toDF("doc_id", "text")
    assert(DupSpans.kmers(df, 20).filter($"doc_id" === 1L || $"doc_id" === 2L).count() === 0L)
    assert(DupSpans.kmers(df, 20).filter($"doc_id" === 3L).count() === 11L)
  }
}
