package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear multi-touch attribution: every touch inside a conversion's
  * lookback window shares the conversion's value equally — the
  * spread-the-credit complement to the last-touch rule (X112), and the
  * place where naive implementations plan a per-user range join.
  *
  * Scale shape: the lookback pairing is a BUCKETED equi-join — with
  * bucket width = lookback L, a touch at gap ≤ L sits in the
  * conversion's bucket or the one before (floor((t−L)/L) = floor(t/L)−1
  * exactly), so each conversion explodes to TWO (key, bucket) probes
  * and the join never becomes a nested loop. Credit splitting is exact
  * integer division: base = value div n, the `value mod n` remainder
  * goes to the most recent touches — Σcredit = value to the micro,
  * in any engine, under any partitioning.
  */
object MultiTouchAttribution {

  /** Per-touch credits: (touch id/time columns of `touches`) +
    * (conv id, gap_us, credit_us). Inputs carry (`keyCol`, `tsUsCol`
    * epoch micros, and for conversions `valueUsCol`); column names
    * across the two frames must be disjoint apart from `keyCol`.
    */
  def linearCredit(conversions: DataFrame, touches: DataFrame, keyCol: String,
      convIdCol: String, convTsUs: String, touchTsUs: String, valueUsCol: String,
      lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0)
    val convB = conversions.withColumn("_mt_b",
      explode(array(expr(s"$convTsUs div $lookbackUs"),
        expr(s"$convTsUs div $lookbackUs") - 1)))
    val touchB = touches.withColumn("_mt_b", expr(s"$touchTsUs div $lookbackUs"))
    val pairs = convB.join(touchB, Seq(keyCol, "_mt_b"))
      .withColumn("gap_us", col(convTsUs) - col(touchTsUs))
      .filter(col("gap_us") >= 0 && col("gap_us") <= lookbackUs)
      .drop("_mt_b")
    val wConv = Window.partitionBy(col(convIdCol))
    val wRank = wConv.orderBy(col("gap_us"), col(touchTsUs))
    pairs
      .withColumn("_mt_n", count(lit(1)).over(wConv))
      .withColumn("_mt_rn", row_number().over(wRank))
      .withColumn("credit_us",
        expr(s"$valueUsCol div _mt_n") +
          when(col("_mt_rn") <= expr(s"$valueUsCol % _mt_n"), 1L).otherwise(0L))
      .drop("_mt_n", "_mt_rn")
  }
}
