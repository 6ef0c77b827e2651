package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Strictly-ordered conversion funnel over an event log: per user, the
  * first time each stage is reached AFTER the previous stage's time
  * (view < click < purchase — a later view does not retro-qualify an
  * earlier click). The per-user event-analytics primitive behind
  * conversion and drop-off reporting.
  *
  * 100 TB design: ONE shuffle total. Events are filtered to the funnel's
  * stage types, shuffled once on the user key, and every stage time is a
  * whole-partition window `min` over that same partitioning — stage i+1's
  * predicate (`us > t_i`) reads stage i's window column, so Catalyst
  * chains k Window operators behind a single Exchange + sort, and the
  * final per-user rollup reuses the partitioning too (no second
  * shuffle). A naive "min time per (user, stage) then repair" pre-pivot
  * is NOT equivalent — the global min of a later stage can precede t_i
  * while a qualifying later event exists — which is why the strict-order
  * predicate must run over the event rows themselves. Times are exact
  * integer microseconds end to end — no float path at all.
  */
object Funnel {

  /** Per-user stage-entry times for `stages` (event-type names), strictly
    * ordered. Row per user reaching stage 1; `t{i}` null once a stage is
    * missed. Output: (user, t1..tk long micros).
    */
  def conversion(events: DataFrame, stages: Seq[String], userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val e = events.filter(col(typeCol).isInCollection(stages))
      .select(col(userCol).as("user"), col(typeCol).as("typ"),
        unix_micros(col(tsCol)).as("us"))
    val w = Window.partitionBy(col("user"))
    val withTs = stages.zipWithIndex.foldLeft(e) { case (cur, (stage, i)) =>
      val qualifies =
        if (i == 0) col("typ") === stage
        else col("typ") === stage && col("us") > col(s"t$i")
      cur.withColumn(s"t${i + 1}", min(when(qualifies, col("us"))).over(w))
    }
    // every row of a user carries identical t1..tk after the windows, so
    // the rollup's min() is just "pick the value"; it runs on the same
    // user partitioning the windows established — no extra exchange
    val ts = stages.indices.map(i => min(col(s"t${i + 1}")).as(s"t${i + 1}"))
    withTs.filter(col("t1").isNotNull)
      .groupBy(col("user"))
      .agg(ts.head, ts.tail: _*)
  }

  /** Time-constrained funnel: like [[conversion]], but stage i+1 must
    * land within `maxGapUs` microseconds of stage i (a purchase 30
    * days after the click is not attribution, it's coincidence — the
    * window is what makes funnel rates comparable across cohorts).
    * Identical one-shuffle plan: the gap bound rides the same window
    * predicate (`t_i < us <= t_i + maxGapUs`).
    */
  def conversionWithin(events: DataFrame, stages: Seq[String], maxGapUs: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    require(maxGapUs > 0, s"conversionWithin: maxGapUs=$maxGapUs must be positive")
    val e = events.filter(col(typeCol).isInCollection(stages))
      .select(col(userCol).as("user"), col(typeCol).as("typ"),
        unix_micros(col(tsCol)).as("us"))
    val w = Window.partitionBy(col("user"))
    val withTs = stages.zipWithIndex.foldLeft(e) { case (cur, (stage, i)) =>
      val qualifies =
        if (i == 0) col("typ") === stage
        else col("typ") === stage && col("us") > col(s"t$i") &&
          col("us") <= col(s"t$i") + maxGapUs
      cur.withColumn(s"t${i + 1}", min(when(qualifies, col("us"))).over(w))
    }
    val ts = stages.indices.map(i => min(col(s"t${i + 1}")).as(s"t${i + 1}"))
    withTs.filter(col("t1").isNotNull)
      .groupBy(col("user"))
      .agg(ts.head, ts.tail: _*)
  }
}
