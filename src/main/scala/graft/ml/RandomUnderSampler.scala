package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{DoubleParam, LongParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Majority-class random undersampling to a target imbalance ratio —
  * Scala re-expression of the reference's custom `Estimator`
  * (`src/random_undersampler.py:7-101`).
  *
  * fit: ratio = n_negative / n_positive; keepFraction =
  * targetRatio / ratio. transform: negatives sampled at keepFraction,
  * positives kept (a filtered union — narrow, no shuffle; the reference's
  * sample-ids-then-anti-join formulation costs an extra shuffle for
  * identical semantics).
  */
class RandomUnderSampler(override val uid: String)
    extends Estimator[RandomUnderSamplerModel] with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("randomUnderSampler"))

  final val labelCol = new Param[String](this, "labelCol", "binary label column")
  final val targetImbalanceRatio = new DoubleParam(this, "targetImbalanceRatio",
    "desired n_negative / n_positive after sampling")
  final val seed = new LongParam(this, "seed", "sampling seed")
  final val hashIdCol = new Param[String](this, "hashIdCol",
    "when non-empty, sample deterministically by multiplicative hash of " +
      "this id column instead of Bernoulli rand() — reproducible across " +
      "runs/partitionings and SQL-portable (used by the oracle-checked query)")

  setDefault(labelCol -> "label", targetImbalanceRatio -> 1.0, seed -> 42L,
    hashIdCol -> "")

  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setTargetImbalanceRatio(v: Double): this.type = set(targetImbalanceRatio, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setHashIdCol(v: String): this.type = set(hashIdCol, v)

  override def fit(ds: Dataset[_]): RandomUnderSamplerModel = {
    val l = col($(labelCol)).cast("double")
    val counts = ds.toDF().groupBy(l.as("l")).count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val nPos = counts.getOrElse(1.0, 0L).toDouble
    val nNeg = counts.getOrElse(0.0, 0L).toDouble
    val ratio = if (nPos > 0) nNeg / nPos else 1.0
    val keep = if (ratio > $(targetImbalanceRatio)) $(targetImbalanceRatio) / ratio else 1.0
    val model = new RandomUnderSamplerModel(uid, keep)
    copyValues(model.setParent(this))
  }

  override def transformSchema(schema: StructType): StructType = schema

  override def copy(extra: ParamMap): RandomUnderSampler = defaultCopy(extra)
}

object RandomUnderSampler extends DefaultParamsReadable[RandomUnderSampler] {
  /** Deterministic per-row keep score in [0, 1): multiplicative integer
    * hash of (id, seed) — Knuth's 2654435761 with an odd seed mix, all in
    * exact long arithmetic (no overflow under ANSI for |id| < 2^31), so
    * DuckDB computes the identical value.
    */
  def hashKeepScore(id: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    pmod((id.cast("long") + lit(seed)) * lit(2654435761L), lit(1000000007L)).cast("double") /
      1000000007.0
}

class RandomUnderSamplerModel(override val uid: String, val keepFraction: Double)
    extends Model[RandomUnderSamplerModel] {

  final val labelCol = new Param[String](this, "labelCol", "binary label column")
  final val seed = new LongParam(this, "seed", "sampling seed")
  final val hashIdCol = new Param[String](this, "hashIdCol", "deterministic-hash id column")
  final val targetImbalanceRatio = new DoubleParam(this, "targetImbalanceRatio",
    "desired n_negative / n_positive after sampling")
  setDefault(labelCol -> "label", seed -> 42L, hashIdCol -> "")

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    if (keepFraction >= 1.0) df
    else {
      val l = col($(labelCol)).cast("double")
      val keepNeg =
        if ($(hashIdCol).nonEmpty)
          RandomUnderSampler.hashKeepScore(col($(hashIdCol)), $(seed)) < keepFraction
        else rand($(seed)) < keepFraction
      // single narrow filter pass — no split/union, no shuffle
      df.filter(l =!= 0.0 || keepNeg)
    }
  }

  override def transformSchema(schema: StructType): StructType = schema

  override def copy(extra: ParamMap): RandomUnderSamplerModel = {
    val m = new RandomUnderSamplerModel(uid, keepFraction)
    copyValues(m, extra).setParent(parent)
  }
}
