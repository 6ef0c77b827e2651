package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Burst-collapse debounce: within each key, an event is kept iff it is
  * the first of its burst — no predecessor within `minGapUs`. Double
  * fires, retry storms, and bot bursts collapse to their first event;
  * the keep predicate is exactly the session-boundary predicate
  * ([[Sessionize]]'s complement: sessionize GROUPS a burst, debounce
  * KEEPS its head). Deterministic given unique (key, ts).
  *
  * 100 TB design: one shuffle on the key, one lag window — identical
  * shape to sessionization; no self-join, no per-key state beyond the
  * window's single previous row.
  */
object Debounce {

  /** Adds `kept` (boolean) from the gap to the previous event of the
    * same keys. `tsCol` must be a timestamp; gaps compare in exact
    * integer micros.
    */
  def flag(events: DataFrame, keyCols: Seq[String], tsCol: String,
      minGapUs: Long): DataFrame = {
    require(keyCols.nonEmpty, "debounce: at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    events.withColumn("kept",
      prev.isNull || unix_micros(col(tsCol)) - prev >= minGapUs)
  }

  /** Keep only burst heads. */
  def debounce(events: DataFrame, keyCols: Seq[String], tsCol: String,
      minGapUs: Long): DataFrame =
    flag(events, keyCols, tsCol, minGapUs).filter(col("kept")).drop("kept")
}
