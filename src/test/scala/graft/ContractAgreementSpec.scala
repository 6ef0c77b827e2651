package graft

import graft.operators.{AnnotatorAgreement, BradleyTerry, DataContract, VocabGrowth}
import org.apache.spark.sql.functions._

/** Data-contract audit (X162), Cohen's κ (X163), Bradley–Terry (X164),
  * vocabulary growth (X165).
  */
class ContractAgreementSpec extends SparkSpec {

  import spark.implicits._

  test("contract audit: each expectation counts its own violations exactly") {
    val df = Seq(
      (Some(1L), 10.0, "1-URGENT", "A"),
      (Some(2L), -5.0, "9-BOGUS", "B"),
      (None, 200.0, "2-HIGH", "C"),
      (Some(4L), 99.0, null, "D")
    ).toDF("k", "price", "prio", "status")
    val out = DataContract.audit(df, Seq(
        DataContract.NotNull("k"),
        DataContract.InRange("price", 0, 100),
        DataContract.MatchesRegex("prio", "^[1-5]-"),
        DataContract.MaxDistinct("status", 3)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(out("not_null") === ((4L, 1L, 0L, false)))
    assert(out("in_range") === ((4L, 2L, 0L, false)), "-5 and 200 out of [0,100]")
    assert(out("matches_regex") === ((4L, 1L, 0L, false)), "nulls are not violations")
    assert(out("max_distinct") === ((4L, 4L, 3L, false)))
    // a passing suite passes
    val ok = DataContract.audit(df.filter(col("k").isNotNull && col("prio").isNotNull),
        Seq(DataContract.MaxDistinct("status", 4)))
      .collect()
    assert(ok.forall(_.getBoolean(5)))
  }

  test("kappa: perfect agreement 1, known 2x2 case matches by hand") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("x", "y")
    assert(AnnotatorAgreement.kappa(perfect, "x", "y").head().getAs[Double]("kappa") === 1.0)
    // classic example: 20 items, a=yes row (15: 10 agree yes, 5 no),
    // po = (10+3)/20 = 0.65; pe = (15*12 + 5*8)/400 = 0.55; k = 2/9
    val rows = Seq.fill(10)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(2)(("n", "y")) ++ Seq.fill(3)(("n", "n"))
    val r = AnnotatorAgreement.kappa(rows.toDF("x", "y"), "x", "y").head()
    assert(r.getAs[Long]("n_items") === 20L)
    assert(r.getAs[Double]("po") === 0.65)
    assert(r.getAs[Double]("pe") === 0.55)
    assert(math.abs(r.getAs[Double]("kappa") - (0.65 - 0.55) / 0.45) < 1e-6)
    // null labels are un-annotated, excluded
    val withNulls = rows ++ Seq((null, "y"), ("y", null))
    assert(AnnotatorAgreement.kappa(withNulls.toDF("x", "y"), "x", "y")
      .head().getAs[Long]("n_items") === 20L)
  }

  test("bradley-terry: a dominant item ranks first with strength 1") {
    // A beats B 9:1, B beats C 9:1, A beats C 9:1 -> order A > B > C
    val games = Seq(("A", "B", 9L), ("B", "A", 1L), ("B", "C", 9L),
      ("C", "B", 1L), ("A", "C", 9L), ("C", "A", 1L)).toDF("w", "l", "n")
    val out = BradleyTerry.strengths(games, "w", "l", "n").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("A", "B", "C"))
    assert(out.head.getAs[Double]("strength") === 1.0, "max-normalized")
    val byItem = out.map(r => r.getString(0) ->
      (r.getAs[Long]("n_wins"), r.getAs[Long]("n_games"))).toMap
    assert(byItem("A") === ((18L, 20L)))
    assert(byItem("C") === ((2L, 20L)))
    assert(out(1).getAs[Double]("strength") > out(2).getAs[Double]("strength"))
  }

  test("bradley-terry: strengths track win probabilities on a two-item duel") {
    // i beats j 3:1 -> P(i wins) = wi/(wi+wj) should approach 0.75
    val games = Seq(("i", "j", 30L), ("j", "i", 10L)).toDF("w", "l", "n")
    val out = BradleyTerry.strengths(games, "w", "l", "n", iterations = 4)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    val p = out("i") / (out("i") + out("j"))
    assert(math.abs(p - 0.75) < 0.02, s"implied P(i beats j) = $p")
  }

  test("vocab growth: new types attribute to the first bucket, cumulative is monotone") {
    val docs = Seq(
      (0L, "a b c"), (1L, "a b"), // bucket 0: types a,b,c
      (10L, "c d"), (11L, "d e f") // bucket 1: new d,e,f
    ).toDF("doc_id", "text")
    val out = VocabGrowth.curve(docs, "doc_id", split(col("text"), " "), bucketWidth = 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0L) === ((2L, 5L, 3L, 3L)))
    assert(out(1L) === ((2L, 5L, 3L, 6L)), "c is not new in bucket 1")
  }
}
