package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group simple linear regression (OLS y = a + b·x) from exact
  * integer moments: slope, intercept, and R² per group in ONE
  * map-side-combined aggregate pass — closed-form, no iteration, no ML
  * fit, and (unlike float `regr_slope`) summation-order-independent:
  * the five co-moment sums accumulate as DECIMAL(38,0) (rank-scale
  * products overflow longs) and only the final ratios drop to double.
  *
  * Scale shape: the whole computation is one groupBy producing a
  * group-count-sized frame — the textbook distributed-regression plan.
  * (n·Sxy − Sx·Sy)² would need ~45 digits, so R² squares the exact
  * difference AFTER the one double cast — both engines state the same
  * cast points, so the doubles agree bit for bit.
  */
object GroupRegression {

  private def dec(c: Column) = c.cast("decimal(38,0)")

  /** (grp, n, slope, intercept, r2) per group; `xCol`/`yCol` must be
    * exact integers (units/cents). Requires x variance > 0 per group.
    */
  def ols(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val m = df.groupBy(col(groupCol).as("grp")).agg(
      count(lit(1)).as("n"),
      sum(dec(x)).as("sx"), sum(dec(y)).as("sy"),
      sum(dec(x * x)).as("sxx"), sum(dec(y * y)).as("syy"),
      sum(dec(x * y)).as("sxy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val denX = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val denY = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val slope = num / denX
    m.select(col("grp"), col("n"),
      round(slope, 6).as("slope"),
      round((col("sy").cast("double") - slope * col("sx").cast("double")) / col("n"), 6)
        .as("intercept"),
      round(num * num / (denX * denY), 6).as("r2"))
  }
}
