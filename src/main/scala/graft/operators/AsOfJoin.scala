package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join — for each left row, the LATEST right row of
  * the same key with `rightTime <= leftTime` — an operator Spark lacks
  * natively. A naive formulation is a range join (left × every earlier
  * right row, then a max per left) whose candidate set explodes with
  * history length; this implementation tags both sides, unions them, and
  * takes one `last(_, ignoreNulls)` window over (key, time, tag) order —
  * ONE shuffle+sort of |L|+|R| rows regardless of history depth, the
  * standard log-structured as-of shape. Ties (`rightTime == leftTime`)
  * match, because the right tag sorts first at equal times.
  *
  * Right (key, time) pairs must be unique for a deterministic result —
  * pre-aggregate the right side otherwise (at equal times the window
  * would carry whichever sorted last).
  *
  * Reserved names: the left frame must not contain columns `_k`, `_t`,
  * `_tag`, `_p`, or `asof` — the internals use the first four and the
  * output adds the `asof` struct column (enforced by `require`).
  */
object AsOfJoin {

  private val Reserved = Set("_k", "_t", "_tag", "_p", "asof")

  /** @param payloadCols right-side columns carried to the output as one
    *                    nullable struct column `asof` (null = no earlier
    *                    right row for that key).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String]): DataFrame = {
    val clash = left.columns.filter(Reserved.contains)
    require(clash.isEmpty,
      s"asOf: left columns ${clash.mkString(", ")} collide with reserved internal names " +
        s"(${Reserved.mkString(", ")}) — rename them before joining")
    val l = left.select(
      col(key).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_tag") +:
        left.columns.toSeq.map(c => col(c).as("_l_" + c)): _*)
    val r = right.select(col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_tag"),
      struct(payloadCols.map(col): _*).as("_p"))
    // allowMissingColumns: left rows get _p = null, right rows get null
    // left-payload columns — the union is the only data movement
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(left.columns.toSeq.map(c => col("_l_" + c).as(c)) :+ col("asof"): _*)
  }
}
