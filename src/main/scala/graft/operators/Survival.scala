package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nelson–Aalen cumulative-hazard curve: time-to-event analysis with
  * right censoring — "how fast do signups convert, given that many
  * haven't yet" — the estimator that handles the users still waiting,
  * which a naive mean-latency (X101) silently drops. The cumulative
  * hazard is chosen over Kaplan–Meier survival because it needs no
  * product/log: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ — and each increment quantizes
  * to integer NANOS before the cumsum, so the accumulation is exact
  * whatever summation tree an engine's window aggregate uses.
  *
  * Scale shape: subjects collapse to per-duration counts first
  * (map-side combine; frame = distinct durations); risk sets come from
  * one prefix-count window on that frame. Nothing touches the event
  * stream after the rollup.
  */
object Survival {

  /** Per event-time curve (t, d, n_risk, hazard, cum_hazard) from
    * subject durations: `tCol` integral duration, `eventCol` 1 = event
    * observed, 0 = right-censored at t. Censored subjects leave the
    * risk set after their time; times with no event (censor-only)
    * contribute to risk-set attrition but emit no row.
    */
  def nelsonAalen(durations: DataFrame, tCol: String, eventCol: String): DataFrame = {
    val perT = durations
      .select(col(tCol).cast("long").as("t"), col(eventCol).cast("int").as("ev"))
      .groupBy(col("t"))
      .agg(sum(when(col("ev") === 1, 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("c_all"))
    val totals = durations.agg(count(lit(1)).as("n_total"))
    val wPrev = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, 0)
    perT
      .withColumn("cum_prev", coalesce(sum(col("c_all")).over(wPrev), lit(0L)))
      .crossJoin(broadcast(totals))
      .withColumn("n_risk", col("n_total") - col("cum_prev"))
      .filter(col("d") > 0)
      .withColumn("h_ppb",
        round(col("d") * lit(1000000000L) / col("n_risk")).cast("long"))
      .withColumn("cum_ppb", sum(col("h_ppb")).over(wCum))
      .select(col("t"), col("d"), col("n_risk"),
        round(col("h_ppb").cast("double") / 1.0e9, 6).as("hazard"),
        round(col("cum_ppb").cast("double") / 1.0e9, 6).as("cum_hazard"))
  }
}
