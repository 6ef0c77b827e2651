package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling-origin (expanding-window) cross-validation folds for
  * time-ordered data: fold f trains on everything up to its cut day
  * and tests on the following `horizonDays` — the leakage-free
  * evaluation protocol for forecasting/ranking models where a random
  * split would let the future leak into training. Complements the
  * hash-based GroupSplit (exchangeable data) with the temporal case.
  *
  * Scale shape: rows collapse to a PER-DAY aggregate first (map-side
  * combine, frame bounded by calendar span, not row count); fold
  * classification is then a tiny folds × days broadcast cross join.
  * Day arithmetic is all integers — cut days replay exactly in any
  * engine.
  */
object RollingOrigin {

  /** Per-fold summary (fold, train_end_day, n_train, n_test,
    * test_value_us): fold f ∈ 1..nFolds cuts at day
    * f·(span − horizonDays)/nFolds (integer division, days indexed
    * from the earliest event) and tests on the next `horizonDays`.
    * `valueCol` is summed over each test window as exact micros.
    */
  def folds(events: DataFrame, tsCol: String, valueCol: String,
      nFolds: Int = 4, horizonDays: Int = 3): DataFrame = {
    require(nFolds >= 1 && horizonDays >= 1)
    val perDay = events
      .select(to_date(col(tsCol)).as("d"),
        round(col(valueCol) * 1000000).cast("long").as("v_us"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"), sum(col("v_us")).as("v_us"))
    val span = perDay.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("d0"), datediff(col("d1"), col("d0")).as("span"))
    val days = perDay.crossJoin(broadcast(span))
      .select(datediff(col("d"), col("d0")).as("day"), col("n"), col("v_us"),
        col("span"))
    val foldIds = explode(sequence(lit(1), lit(nFolds))).as("fold")
    days.select(col("day"), col("n"), col("v_us"),
        (col("span") - horizonDays).as("trainable"), foldIds)
      // integer `div`, not `/` (Column `/` is double division); values
      // are non-negative so floor and truncate agree with the oracle
      .withColumn("train_end_day", expr(s"fold * trainable div $nFolds").cast("int"))
      .groupBy(col("fold"), col("train_end_day"))
      .agg(
        sum(when(col("day") <= col("train_end_day"), col("n")).otherwise(0L))
          .as("n_train"),
        sum(when(col("day") > col("train_end_day") &&
          col("day") <= col("train_end_day") + horizonDays, col("n")).otherwise(0L))
          .as("n_test"),
        sum(when(col("day") > col("train_end_day") &&
          col("day") <= col("train_end_day") + horizonDays, col("v_us")).otherwise(0L))
          .as("test_value_us"))
      .orderBy(col("fold"))
  }
}
