package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{DoubleArrayParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Adds a per-row `weight` column from per-class weights — Scala
  * re-expression of the reference's `ClassWeighter`
  * (`src/class_weighter.py:7-43`): weight = classWeight[label].
  *
  * Pure narrow projection (a `when` chain) — no shuffle, stays inside
  * whole-stage codegen.
  */
class ClassWeighter(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("classWeighter"))

  final val labelCol = new Param[String](this, "labelCol", "label column (0/1)")
  final val weightCol = new Param[String](this, "weightCol", "output weight column")
  final val classWeights = new DoubleArrayParam(this, "classWeights",
    "weight per class, indexed by label")

  setDefault(labelCol -> "label", weightCol -> "weight")

  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setWeightCol(v: String): this.type = set(weightCol, v)
  def setClassWeights(v: Array[Double]): this.type = set(classWeights, v)

  /** Convenience: balanced weights n/(k*n_c) from the data, where k is
    * the number of classes actually present (sklearn's "balanced" rule —
    * the binary divisor 2 would mis-weight multi-class inputs). Labels in
    * [0, max] absent from the data get weight 0.0 — no row can carry
    * that label at transform time on the same distribution, and throwing
    * would break legal degenerate inputs (e.g. an all-positive fold).
    */
  def fitBalanced(df: DataFrame): this.type = {
    val counts = df.groupBy(col($(labelCol)).cast("int").as("l")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "fitBalanced on an empty dataset")
    val n = counts.values.sum.toDouble
    val k = counts.size.toDouble
    val w = (0 to counts.keys.max).map { l =>
      counts.get(l).map(nc => n / (k * nc)).getOrElse(0.0)
    }.toArray
    set(classWeights, w)
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val ws = $(classWeights)
    val l = col($(labelCol)).cast("int")
    val expr = ws.zipWithIndex.tail.foldLeft(lit(ws.head)) { case (acc, (w, i)) =>
      when(l === i, w).otherwise(acc)
    }
    ds.withColumn($(weightCol), expr)
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField($(weightCol), DoubleType, nullable = false))

  override def copy(extra: ParamMap): ClassWeighter = defaultCopy(extra)
}

object ClassWeighter extends DefaultParamsReadable[ClassWeighter]
