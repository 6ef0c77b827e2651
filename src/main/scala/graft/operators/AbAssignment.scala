package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic A/B arm assignment + sample-ratio-mismatch (SRM)
  * check. Assignment hashes `salt:unit` (md5 → 60-bit int → mod k), so
  * the same unit always lands in the same arm, different experiments
  * (salts) are independent, and any engine can replay the mapping —
  * the experimentation primitive behind data-pipeline A/Bs (tokenizer
  * variants, filter thresholds) as much as product ones.
  *
  * The SRM gate is the first thing to check before reading any
  * experiment: arm sizes off their expected split mean the assignment
  * or logging is broken and every downstream metric is garbage. The
  * χ² statistic against an equal split is computed as
  * `k·Σo² / n − n` — algebraically Σ(o−e)²/e for e = n/k, but built
  * from ONE exact integer Σo² so no float summation order exists.
  *
  * Scale shape (100 TB): assignment is a stateless map-side
  * expression; the check is one map-side-combined count per arm
  * (k rows) and a driver-free single-row reduction.
  */
object AbAssignment {

  /** Add an `arm` column in [0, k). */
  def assign(df: DataFrame, k: Int, salt: String,
      unitCol: String = "user_id"): DataFrame = {
    require(k >= 2, s"k=$k needs at least 2 arms")
    df.withColumn("arm",
      pmod(conv(substring(md5(concat(lit(salt + ":"), col(unitCol).cast("string"))), 1, 15),
        16, 10).cast("long"), lit(k.toLong)).cast("int"))
  }

  /** One-row SRM report over distinct units: (n long, k int, chi2 r6,
    * max_share r6). χ² ≫ the k−1-dof critical value ⇒ broken split.
    */
  def srmCheck(df: DataFrame, k: Int, salt: String,
      unitCol: String = "user_id"): DataFrame = {
    val arms = assign(df.select(col(unitCol)).distinct(), k, salt, unitCol)
      .groupBy(col("arm")).agg(count(lit(1)).as("o"))
    arms.agg(sum(col("o")).as("n"), sum(col("o") * col("o")).as("sumsq"),
        max(col("o")).as("omax"))
      .select(col("n"), lit(k).as("k"),
        round(lit(k.toLong) * col("sumsq") / col("n").cast("double") - col("n"), 6)
          .as("chi2"),
        round(col("omax").cast("double") / col("n").cast("double"), 6).as("max_share"))
  }
}
