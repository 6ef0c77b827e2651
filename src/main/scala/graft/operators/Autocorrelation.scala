package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Autocorrelation function (ACF) of an event-value series at lags
  * 1..maxLag — the time-series diagnostic behind "does yesterday
  * predict today?": seasonality shows as peaks at the period,
  * white-noise telemetry decays to ~0 immediately, a slow decay flags
  * trends the anomaly monitor ([[AnomalyDetection]]) should detrend
  * first. Pairs are formed per key in event order; the reported r per
  * lag is the pooled Pearson correlation over all (v_t, v_{t+lag})
  * pairs.
  *
  * Exactness: values are centi-long fixed-point, all five moment sums
  * per lag (Σx, Σy, Σxy, Σx², Σy²) are exact integer aggregates, and
  * r is one fixed double expression of those longs — so the whole
  * curve hash-replays. (Long moments are exact to ~10⁵ rows × 10⁵
  * centi values; at true 100 TB scale cast the product sums to
  * DECIMAL(38,0) — same plan, wider cells.)
  *
  * Scale shape: ONE shuffle on the key (all maxLag lag columns chain
  * behind the same Exchange + sort — Catalyst collapses same-spec
  * windows) and ONE map-side-combined aggregate carrying all lags'
  * moments together; the maxLag-row report assembles driver-side from
  * that single constant-size row.
  */
object Autocorrelation {

  /** (lag int, n_pairs long, r double r6) for lags 1..maxLag, ordered
    * by lag. Lags with fewer than 2 pairs or zero variance report null
    * r (undefined, not 0).
    */
  def acf(events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"acf: maxLag=$maxLag must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    // secondary sort on the (centi-long) value: duplicate (key, ts) rows
    // would otherwise pair engine-/partition-order-dependently, breaking
    // the hash-replay claim — the oracle window shares this tie-break
    val w = Window.partitionBy(col("_k")).orderBy(col("_us"), col("_v"))
    val base = events.select(col(keyCol).as("_k"),
      unix_micros(col(tsCol)).as("_us"),
      round(col(valueCol) * 100).cast("long").as("_v"))
    val withLags = (1 to maxLag).foldLeft(base) { (cur, l) =>
      cur.withColumn(s"_v$l", lag(col("_v"), l).over(w))
    }
    val aggs = (1 to maxLag).flatMap { l =>
      val x = col(s"_v$l"); val y = col("_v"); val p = x.isNotNull
      Seq(sum(when(p, 1L).otherwise(0L)).as(s"n$l"),
        sum(when(p, x).otherwise(0L)).as(s"sx$l"),
        sum(when(p, y).otherwise(0L)).as(s"sy$l"),
        sum(when(p, x * y).otherwise(0L)).as(s"sxy$l"),
        sum(when(p, x * x).otherwise(0L)).as(s"sxx$l"),
        sum(when(p, y * y).otherwise(0L)).as(s"syy$l"))
    }
    val row = withLags.agg(aggs.head, aggs.tail: _*).head()
    def g(name: String): Long =
      if (row.isNullAt(row.fieldIndex(name))) 0L else row.getAs[Long](name)
    (1 to maxLag).map { l =>
      val n = g(s"n$l")
      val (sx, sy, sxy, sxx, syy) =
        (g(s"sx$l"), g(s"sy$l"), g(s"sxy$l"), g(s"sxx$l"), g(s"syy$l"))
      val cov = n.toDouble * sxy - sx.toDouble * sy
      val vx = n.toDouble * sxx - sx.toDouble * sx
      val vy = n.toDouble * syy - sy.toDouble * sy
      val r = if (n >= 2 && vx > 0 && vy > 0)
        Some(math.rint(cov / (math.sqrt(vx) * math.sqrt(vy)) * 1e6) / 1e6)
      else None
      (l, n, r)
    }.toDF("lag", "n_pairs", "r").orderBy(col("lag"))
  }
}
