package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequent n-grams over per-user event sequences: the order-n
  * generalization of the first-order [[Transitions]] matrix. Where the
  * transition matrix answers "what happens next", sequence n-grams
  * answer "what *paths* recur" — the standard mining pass behind funnel
  * discovery, session-template clustering, and bot fingerprinting (a
  * scripted client replays the same trigram thousands of times), and
  * the event-stream analogue of the text n-gram statistics the corpus
  * pipeline already ships.
  *
  * Scale shape (100 TB): ONE shuffle partitions by user for the lead()
  * chain — an n-gram window needs n−1 rows of lookahead state per user,
  * never the whole sequence. Gram counts collapse map-side (partial
  * aggregation) to ≤ |types|ⁿ rows, and the global top-k plans as
  * TakeOrderedAndProject (per-partition heads of size k, no global
  * sort). Sequence order is (ts, event_id) so ties replay identically
  * on every engine.
  */
object SequenceNgrams {

  /** Top-k most frequent n-grams of `typeCol` across all user
    * sequences.
    *
    * @return (w0..w{n-1}, n long, rk int) ordered by count desc with
    *         the gram itself as the deterministic tie-break.
    */
  def topNgrams(events: DataFrame, n: Int = 3, k: Int = 20,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    require(n >= 2, s"n=$n: an n-gram needs at least 2 events")
    require(k >= 1, s"k=$k must be >= 1")
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)).asc, col(tieCol).asc)
    val gramCols: Seq[Column] = (0 until n).map {
      case 0 => col(typeCol).as("w0")
      case i => lead(col(typeCol), i).over(w).as(s"w$i")
    }
    val names = (0 until n).map(i => s"w$i")
    val grams = events.select(gramCols: _*)
      .filter(names.tail.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(names.map(col): _*).agg(count(lit(1)).as("n"))
    val ord = col("n").desc +: names.map(col(_).asc)
    val rkW = Window.orderBy(ord: _*)
    grams.orderBy(ord: _*).limit(k)
      .withColumn("rk", row_number().over(rkW))
      .select(names.map(col) ++ Seq(col("n"), col("rk")): _*)
      .orderBy(col("rk"))
  }
}
