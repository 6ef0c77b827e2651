package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order transition matrix over per-user event sequences: counts
  * and probabilities of "what happens next" — the Markov-chain view of
  * a clickstream that powers next-action prediction features, funnel
  * design, and bot detection (a user whose transition row is a delta
  * function is a script). The sequence order is (ts, event_id) so ties
  * resolve identically on every engine.
  *
  * Scale shape (100 TB): ONE shuffle partitions by user for the lead()
  * — per-user state is a single previous row, and the per-user
  * partitions are tiny by construction (no global sort anywhere).
  * Transition counts then collapse map-side to ≤ |types|² rows, and
  * the row-normalizing totals derive from the counts table itself —
  * the stream is never re-scanned.
  */
object Transitions {

  /** (cur, nxt, n long, p double r6) — counts and row-normalized
    * probabilities, ordered by (cur, nxt). */
  def matrix(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)).asc, col(tieCol).asc)
    val c = events
      .select(col(userCol), col(typeCol).as("cur"),
        lead(col(typeCol), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("cur")).agg(sum(col("n")).as("t"))
    c.join(tot, "cur")
      .select(col("cur"), col("nxt"), col("n"),
        round(col("n").cast("double") / col("t").cast("double"), 6).as("p"))
      .orderBy(col("cur"), col("nxt"))
  }
}
