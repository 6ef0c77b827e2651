package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement (Cohen's κ) between two label columns —
  * the labeling-QA gate for supervised data: raw percent agreement
  * overstates quality when the label distribution is skewed, κ
  * discounts the agreement two annotators would reach by chance from
  * their own marginals (κ = (p_o − p_e)/(1 − p_e); ≳0.6 substantial,
  * ≲0.2 noise). Works for any pair of labelers: two humans, a
  * heuristic vs. ground truth, an old vs. new classifier version.
  *
  * Exactness: everything upstream of the two final divisions is exact
  * long arithmetic — the confusion matrix, the diagonal, and the
  * chance-agreement numerator Σ row_l · col_l — so κ hash-replays on
  * any engine (p_e is ONE division of a long by n², not a sum of
  * per-label float products).
  *
  * Scale shape (100 TB): one map-side-combined groupBy collapses the
  * table to the |labels|² confusion matrix; every step after that is
  * metadata-scale.
  */
object AnnotatorAgreement {

  /** Single-row report (n_items, n_agree, po r6, pe r6, kappa r6) for
    * label columns `aCol` vs `bCol`. Rows where either label is null
    * are excluded (un-annotated items).
    */
  def kappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_n"))
      .collect()
    val n = conf.map(_.getLong(2)).sum
    require(n > 0, "kappa: no doubly-labeled rows")
    val agree = conf.filter(r => r.get(0) == r.get(1)).map(_.getLong(2)).sum
    val colM = conf.groupBy(_.get(1)).map { case (k, g) => k -> g.map(_.getLong(2)).sum }.toMap
    val peNum = conf.groupBy(_.get(0)).map { case (k, g) =>
      g.map(_.getLong(2)).sum * colM.getOrElse(k, 0L)
    }.sum
    val po = agree.toDouble / n
    val pe = peNum.toDouble / (n.toDouble * n)
    val k = if (pe == 1.0) 1.0 else (po - pe) / (1.0 - pe)
    val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
    Seq((n, agree, r6(po), r6(pe), r6(k)))
      .toDF("n_items", "n_agree", "po", "pe", "kappa")
  }
}
