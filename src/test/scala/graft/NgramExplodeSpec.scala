package graft

import org.apache.spark.sql.functions._

class NgramExplodeSpec extends SparkSpec {

  test("generator emits positional n-grams; short and null texts emit nothing") {
    val s = spark; import s.implicits._
    Seq((1L, "a b c d"), (2L, "x y"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").createOrReplaceTempView("ng_v")
    val rows = s.sql(
      """SELECT doc_id, pos, ngram FROM ng_v
        |LATERAL VIEW graft_ngrams(text, 3) t AS pos, ngram
        |ORDER BY doc_id, pos""".stripMargin)
      .as[(Long, Int, String)].collect().toSeq
    assert(rows == Seq((1L, 0, "a b c"), (1L, 1, "b c d")))
  }

  test("UDTF output matches the split/transform/posexplode equivalent on real text") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "the quick brown fox jumps"), (2L, "spark sql spark sql spark"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("ng_eq_v")
    val viaUdtf = s.sql(
      """SELECT ngram, count(*) AS n FROM ng_eq_v
        |LATERAL VIEW graft_ngrams(text, 2) t AS pos, ngram
        |GROUP BY ngram ORDER BY ngram""".stripMargin)
      .as[(String, Long)].collect().toSeq
    val words = docs.select(posexplode(split(col("text"), " ")).as(Seq("pos", "w")),
      col("doc_id"))
    val viaJoin = words.alias("a")
      .join(words.alias("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
      .select(concat_ws(" ", col("a.w"), col("b.w")).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
      .orderBy(col("ngram")).as[(String, Long)].collect().toSeq
    assert(viaUdtf == viaJoin)
  }
}
