package graft

import graft.operators.{Debounce, PostingsIndex, SpanCorruption}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Span corruption (X146), delta postings (X147), debounce (X148). */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  test("span corruption: reassembly is exact and the mask is replayable") {
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "x")).toDF("doc_id", "text")
    val out = SpanCorruption.corrupt(docs, every = 3).orderBy($"doc_id").collect()
    val r1 = out(0)
    val toks = "a b c d e f g h i j".split(" ")
    // replay the mask contract by hand: md5("1:i") 60-bit prefix % 3 == 0
    def masked(id: Long, i: Int): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16) % 3 == 0
    }
    val expInput = toks.zipWithIndex
      .map { case (t, i) => if (masked(1L, i)) "<X>" else t }.mkString(" ")
    val expTarget = toks.zipWithIndex
      .collect { case (t, i) if masked(1L, i) => t }.mkString(" ")
    assert(r1.getAs[Long]("n_tokens") === 10)
    assert(r1.getAs[String]("input_text") === expInput)
    assert(r1.getAs[String]("target_text") === expTarget)
    assert(r1.getAs[Long]("n_masked") === expTarget.split(" ").count(_.nonEmpty))
    // masked + kept partition the tokens
    val kept = r1.getAs[String]("input_text").split(" ").count(_ != "<X>")
    assert(kept + r1.getAs[Long]("n_masked") === 10)
  }

  test("span corruption plans with zero exchanges — row-local throughout") {
    val p = SpanCorruption.corrupt(Tables.load(spark, TestSpark.sf0001, "documents"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "corruption must not shuffle:\n" + p)
  }

  test("delta postings: gaps reconstruct the sorted doc list") {
    val docs = Seq((10L, "alpha beta"), (13L, "alpha"), (14L, "beta alpha beta"),
      (99L, "alpha unique")).toDF("doc_id", "text")
    val out = PostingsIndex.deltaPostings(docs, minDf = 1).orderBy($"token")
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("df"), r.getAs[Long]("head_doc"),
          Option(r.getAs[java.lang.Long]("max_delta")).map(_.toLong),
          r.getAs[String]("deltas_csv"))).toMap
    assert(out("alpha") === ((4L, 10L, Some(85L), "3,1,85")))
    assert(out("beta") === ((2L, 10L, Some(4L), "4")))
    assert(out("unique") === ((1L, 99L, None, "")))
  }

  test("delta postings: the window and agg reuse the token shuffle — one exchange") {
    val p = PostingsIndex
      .deltaPostings(Tables.load(spark, TestSpark.sf0001, "documents"), minDf = 20)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "lag window + final agg must ride the one token shuffle:\n" + p)
  }

  test("debounce collapses bursts to their head, per key") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, "click", ts(0)), (1L, "click", ts(30)), (1L, "click", ts(50)),
      (1L, "click", ts(200)), // new burst: 150s after previous raw event
      (1L, "view", ts(10)),   // other key: independent
      (2L, "click", ts(20))
    ).toDF("user_id", "event_type", "ts")
    val kept = Debounce.debounce(ev, Seq("user_id", "event_type"), "ts",
        minGapUs = 100L * 1000000L)
      .select($"user_id", $"event_type", (unix_micros($"ts") / 1000000L).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(kept === Set((1L, "click", 0L), (1L, "click", 200L),
      (1L, "view", 10L), (2L, "click", 20L)))
  }
}
