package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** χ² keyword selection: for each class (language, source, label…), the
  * tokens whose document frequency is most skewed toward that class —
  * the classic supervised feature-selection / "what words characterize
  * this slice" report over a labeled corpus.
  *
  * 100 TB design: ONE shuffle on the token — the exploded distinct-token
  * stream collapses map-side to (token, class) counts; per-token totals
  * come from a window over that aggregate (same partitioning), class
  * sizes and the corpus size broadcast in as one-row/tiny aggregates.
  * Every 2×2 cell is an exact long, and the χ² statistic is built from
  * longs cast to double at the end — products stay < 2⁶³ up to corpora
  * of ~3M docs per side of the contingency table; beyond that, lift the
  * cells to doubles before multiplying (the ranking is insensitive to
  * the last ulp at that scale).
  */
object ChiSquareKeywords {

  /** (class, rk, token, a, chi2): top-`topK` tokens per class by χ² of
    * the presence/absence 2×2 table; `a` = docs of the class containing
    * the token. Tokens rarer than `minDf` or present in every document
    * are dropped (the latter have a degenerate table).
    */
  def topKeywords(docs: DataFrame, classCol: String, textCol: String = "text",
      minDf: Long = 5L, topK: Int = 3): DataFrame = {
    val tok = docs.select(col(classCol).as("cls"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("token"))
    val tl = tok.groupBy(col("token"), col("cls")).agg(count(lit(1)).as("a"))
    val classSizes = docs.groupBy(col(classCol).as("cls")).agg(count(lit(1)).as("n_cls"))
    val corpus = docs.agg(count(lit(1)).as("n_all"))
    val delta = col("a") * col("d") - col("b") * col("c")
    tl
      .withColumn("tok_total", sum(col("a")).over(Window.partitionBy(col("token"))))
      .join(broadcast(classSizes), "cls")
      .crossJoin(broadcast(corpus))
      .filter(col("tok_total") >= minDf && col("tok_total") < col("n_all"))
      .withColumn("b", col("n_cls") - col("a"))
      .withColumn("c", col("tok_total") - col("a"))
      .withColumn("d", col("n_all") - col("n_cls") - col("c"))
      .withColumn("chi2",
        col("n_all").cast("double") * (delta * delta).cast("double") /
          ((col("a") + col("b")) * (col("c") + col("d")) *
            (col("a") + col("c")) * (col("b") + col("d"))).cast("double"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cls")).orderBy(col("chi2").desc, col("token").asc)))
      .filter(col("rk") <= topK)
      .select(col("cls"), col("rk"), col("token"), col("a"), col("chi2"))
  }
}
