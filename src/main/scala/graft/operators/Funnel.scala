package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strictly-ordered conversion funnel over an event log: per user, the
  * first time each stage is reached AFTER the previous stage's time
  * (view < click < purchase — a later view does not retro-qualify an
  * earlier click). The per-user event-analytics primitive behind
  * conversion and drop-off reporting.
  *
  * 100 TB design: one aggregation per stage, each a min() on (user,
  * carried stage times) — map-side combined, shuffled on the user key
  * every round, so k stages cost k narrow shuffles of ONE ROW PER
  * SURVIVING USER (not per event; the event table is filtered to the
  * stage's type before each join). Times are exact integer microseconds
  * end to end — no float path at all.
  */
object Funnel {

  /** Per-user stage-entry times for `stages` (event-type names), strictly
    * ordered. Row per user reaching stage 1; `t{i}` null once a stage is
    * missed. Output: (user, t1..tk long micros).
    */
  def conversion(events: DataFrame, stages: Seq[String], userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val e = events.select(col(userCol).as("user"), col(typeCol).as("typ"),
      unix_micros(col(tsCol)).as("us"))
    val first = e.filter(col("typ") === stages.head)
      .groupBy(col("user")).agg(min(col("us")).as("t1"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (cur, (stage, i)) =>
      val prev = s"t$i"; val nxt = s"t${i + 1}"
      val carried = col("user") +: (1 to i).map(j => col(s"t$j"))
      val stageEv = e.filter(col("typ") === stage)
        .select(col("user").as("_su"), col("us"))
      cur.join(stageEv, col("user") === col("_su") && col("us") > col(prev), "left_outer")
        .groupBy(carried: _*)
        .agg(min(col("us")).as(nxt))
    }
  }
}
