package graft

import graft.operators.BpeApply
import org.apache.spark.sql.functions._

/** BPE apply against the literal reference algorithm (lowest-rank pair
  * present, leftmost occurrence, ONE merge per step — GPT-2's loop),
  * plus the fit loop's determinism and fit→apply round trip.
  */
class BpeApplySpec extends SparkSpec {

  import spark.implicits._

  /** Reference: one merge at a time, always the lowest-rank pair
    * present, leftmost occurrence of it.
    */
  private def referenceEncode(w: String, merges: Seq[(String, String)]): String = {
    var syms = w.map(_.toString).toVector
    var done = false
    while (!done) {
      val hit = merges.iterator.zipWithIndex
        .map { case ((a, b), r) =>
          (r, syms.indices.dropRight(1).find(i => syms(i) == a && syms(i + 1) == b))
        }
        .collectFirst { case (r, Some(i)) => (r, i) }
      hit match {
        case Some((r, i)) =>
          val (a, b) = merges(r)
          syms = syms.patch(i, Seq(a + b), 2)
        case None => done = true
      }
    }
    syms.mkString(" ")
  }

  private val merges = Seq(
    "t" -> "a", "ta" -> "b", "l" -> "e", "tab" -> "le",
    "v" -> "a", "va" -> "l", "u" -> "e", "val" -> "ue",
    "a" -> "a", "aa" -> "aa")

  test("single-pass-per-rank apply == one-merge-at-a-time reference, incl. runs") {
    val words = Seq("table", "value", "tab", "ttaabb", "aaaa", "aaaaa", "aaaaaaa",
      "tabletable", "valuevalue", "x", "", "zzzz", "avalanche", "Ttable")
    val got = words.toDF("w")
      .select($"w", BpeApply.encodeCol($"w", merges).as("enc"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach { w =>
      assert(got(w) === referenceEncode(w, merges), s"word '$w'")
    }
    // runs exercise the overlap rule: 4 a's -> aa aa -> aaaa; 5 -> aaaa a
    assert(got("aaaa") === "aaaa")
    assert(got("aaaaa") === "aaaa a")
    assert(got("aaaaaaa") === "aaaa aa a")
  }

  test("inconsistent merge list fails fast") {
    val e = intercept[IllegalArgumentException] {
      BpeApply.encodeCol(lit("x"), Seq("ab" -> "c")) // 'ab' never produced
    }
    assert(e.getMessage.contains("no earlier merge produces"), e.getMessage)
  }

  test("fit is deterministic and its merges are training-consistent") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents").limit(100)
    val m1 = BpeApply.fitMerges(docs, k = 6)
    val m2 = BpeApply.fitMerges(docs, k = 6)
    assert(m1 === m2, "same corpus, same seedless count -> same merges")
    assert(m1.length === 6)
    BpeApply.requireConsistent(m1) // throws if not
    // fit -> apply round trip: fitted merges actually compress
    val enc = docs.select(explode(split($"text", "\\s+")).as("w"))
      .filter(length($"w") >= 2).limit(50)
      .select($"w", BpeApply.encodeCol($"w", m1).as("enc"))
      .withColumn("n", size(split($"enc", " ")))
      .agg(sum(length($"w")).as("chars"), sum($"n").as("toks"))
      .collect()(0)
    assert(enc.getLong(1) < enc.getLong(0), "fitted merges must reduce token count")
  }

  test("tokenIds: dense 1..|V| vocab, ids decode back to the encoded symbols") {
    val docs = Seq((1L, "table value table"), (2L, "tab value zz"))
      .toDF("doc_id", "text")
    val enc = BpeApply.encodeWords(docs, merges, maxWords = 5)
    val ids = BpeApply.tokenIds(enc)
    // vocab reconstruction: symbol -> id must be a bijection onto 1..|V|
    val symById = enc.select(explode(split($"encoded", " ")).as("sym"))
      .groupBy($"sym").count().collect()
      .sortBy(r => (-r.getLong(1), r.getString(0)))
      .zipWithIndex.map { case (r, i) => (i + 1).toLong -> r.getString(0) }.toMap
    assert(symById.keySet === (1L to symById.size.toLong).toSet)
    val encoded = enc.select($"doc_id", $"word_pos", $"encoded").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    ids.collect().foreach { r =>
      val key = (r.getLong(r.fieldIndex("doc_id")), r.getInt(r.fieldIndex("word_pos")))
      val decoded = r.getString(r.fieldIndex("ids_csv")).split(",")
        .map(s => symById(s.toLong)).mkString(" ")
      assert(decoded === encoded(key), s"round trip at $key")
      assert(r.getLong(r.fieldIndex("n_tokens")) ===
        encoded(key).split(" ").length.toLong)
    }
  }

  test("property: fit on random corpora, apply == reference on every word") {
    // deterministic xorshift (same pattern as NativeAsOfJoinPropSpec)
    var seed = 0xbeefL
    def nxt(n: Int): Int = {
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      math.floorMod(seed, n.toLong).toInt
    }
    (1 to 3).foreach { caseNo =>
      val alphabet = "abcd"
      val words = (0 until 40).map { _ =>
        (0 until 2 + nxt(7)).map(_ => alphabet(nxt(alphabet.length))).mkString
      }
      val docs = words.grouped(8).map(_.mkString(" ")).toSeq.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
      val fitted = BpeApply.fitMerges(docs, k = 5)
      BpeApply.requireConsistent(fitted)
      val got = words.distinct.toDF("w")
        .select($"w", BpeApply.encodeCol($"w", fitted).as("enc"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      words.distinct.foreach { w =>
        assert(got(w) === referenceEncode(w, fitted),
          s"case $caseNo word '$w' merges $fitted")
      }
    }
  }

  test("property: decode(encode(w)) == w through ids + vocab on randomized corpora") {
    var seed = 0xdeadL
    def nxt(n: Int): Int = {
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      math.floorMod(seed, n.toLong).toInt
    }
    (1 to 3).foreach { caseNo =>
      val alphabet = "abcde"
      val words = (0 until 40).map { _ =>
        (1 + nxt(8) to 0 by -1).map(_ => alphabet(nxt(alphabet.length))).mkString
      }
      val docs = words.grouped(5).map(_.mkString(" ")).toSeq.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
      val fitted = BpeApply.fitMerges(docs, k = 4 + nxt(4))
      val enc = BpeApply.encodeWords(docs, fitted, maxWords = 5)
      val decoded = BpeApply.decodeIds(BpeApply.tokenIds(enc), BpeApply.vocabOf(enc))
        .join(enc.select($"doc_id", $"word_pos", $"word"), Seq("doc_id", "word_pos"))
        .select($"word", $"decoded_word").collect()
      assert(decoded.nonEmpty, s"case $caseNo")
      decoded.foreach { r =>
        assert(r.getString(1) === r.getString(0),
          s"case $caseNo: decode must reproduce '${r.getString(0)}' exactly")
      }
    }
  }

  test("unicode: surrogate pairs stay whole symbols") {
    val got = Seq("a😀b").toDF("w")
      .select(BpeApply.encodeCol($"w", Seq("a" -> "b")).as("enc"))
      .collect()(0).getString(0)
    assert(got === "a 😀 b") // emoji is ONE symbol; a+b not adjacent
  }
}
