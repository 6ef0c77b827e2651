package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed logistic regression: full-batch gradient
  * descent, a FIXED number of iterations, every per-row gradient and
  * loss term floored onto a 10⁻⁶ grid before summation — so the
  * per-iteration aggregates are EXACT integer sums (order-independent
  * under any partitioning) and the weight trajectory is a fixed IEEE
  * expression of those longs. The result: a trained classifier whose
  * entire fit — weights, accuracy, loss curve — hash-replays on an
  * external SQL engine, unlike any stochastic MLlib fit. The
  * engine-native complement to the seeded-but-unreplayable forest
  * queries (SURVEY §2.12's rows-only residue): when the audit story
  * matters more than the last AUC point, THIS is the trainer.
  *
  * Scale shape (100 TB): one map-side-combined aggregate per
  * iteration over the (persisted) feature frame — the same shape as
  * [[graft.operators.GroupOls]]-style moment fits; the driver holds
  * only the (|features|+1)-long weight vector. Learning rate and
  * iteration count are caller-fixed; features should be pre-scaled to
  * ~[0,1] (the caller's standardization is part of the contract).
  *
  * Each output row t carries the weights AFTER update t, with
  * n_correct / mean_loss evaluated at the PRE-update weights (the ones
  * that produced the gradients — one aggregate per iteration, no extra
  * pass).
  */
object LogisticGD {

  /** (iter, b r6, w_<f1> r6, ..., n, n_correct, mean_loss r6) for
    * iterations 1..T; `yCol` must be 0.0/1.0.
    */
  def fit(df: DataFrame, yCol: String, features: Seq[String],
      lr: Double, iterations: Int): DataFrame = {
    require(features.nonEmpty && iterations >= 1 && lr > 0,
      s"features=$features iterations=$iterations lr=$lr")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(yCol).cast("double").as("_y") +:
      features.map(f => col(f).cast("double").as(s"_x_$f")): _*)
    var w = Array.fill(features.size + 1)(0.0) // (intercept, w_f1, ...)
    val out = Seq.newBuilder[(Int, Seq[Double], Long, Long, Double)]
    for (t <- 1 to iterations) {
      val z = features.zipWithIndex.foldLeft(lit(w(0)): Column) {
        case (acc, (f, i)) => acc + lit(w(i + 1)) * col(s"_x_$f")
      }
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val r = p - col("_y")
      // clamped log-loss (p hits exactly 0/1 only at +-inf z; clamp
      // keeps ln finite on both engines identically)
      val pc = least(greatest(p, lit(1e-12)), lit(1.0 - 1e-12))
      val loss = -(col("_y") * log(pc) + (lit(1.0) - col("_y")) * log(lit(1.0) - pc))
      val aggs =
        Seq(count(lit(1)).as("_n"),
          sum(when((p > 0.5).cast("int") === col("_y").cast("int"), 1L).otherwise(0L))
            .as("_ok"),
          sum(floor(loss * 1e6).cast("long")).as("_loss"),
          sum(floor(r * 1e6).cast("long")).as("_g0")) ++
        features.zipWithIndex.map { case (f, i) =>
          sum(floor(r * col(s"_x_$f") * 1e6).cast("long")).as(s"_g${i + 1}")
        }
      val row = base.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(0)
      require(n > 0, "LogisticGD.fit: empty input")
      val (ok, lossSum) = (row.getLong(1), row.getLong(2))
      w = w.indices.map { j =>
        w(j) - lr * (row.getLong(3 + j).toDouble / 1e6 / n)
      }.toArray
      val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
      out += ((t, w.map(r6).toSeq, n, ok, r6(lossSum.toDouble / 1e6 / n)))
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}
    val schema = StructType(
      StructField("iter", IntegerType, nullable = false) +:
        (("b" +: features.map(f => s"w_$f")).map(StructField(_, DoubleType, nullable = false)) ++
          Seq(StructField("n", LongType, nullable = false),
            StructField("n_correct", LongType, nullable = false),
            StructField("mean_loss", DoubleType, nullable = false))))
    val rows = out.result().map { case (t, ws, n, ok, ml) =>
      // Seq[Any] explicitly: Seq(n, ok, ml) would numeric-widen the
      // longs to Double (Scala unifies mixed numerics), corrupting the
      // LongType slots
      Row.fromSeq(Seq[Any](t) ++ ws ++ Seq[Any](n, ok, ml))
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema).orderBy(col("iter"))
  }
}
