package org.apache.spark.ml.graftbridge

import org.apache.spark.ml.param.Params
import org.apache.spark.ml.util.{DefaultParamsReader, DefaultParamsWriter}
import org.apache.spark.sql.SparkSession
import org.json4s.{JObject, JValue}

/** Params-metadata bridge for custom ML stage persistence. Spark keeps
  * `DefaultParamsWriter`/`DefaultParamsReader` `private[ml]`, but any
  * library shipping a custom `Model` with non-trivial state (here:
  * `RandomUnderSamplerModel.removedIds`, a DataFrame) must write the
  * exact metadata.json layout those readers expect, or
  * `PipelineModel.load` cannot reconstruct the stage. A shim in the ml
  * namespace is the standard extension-library technique (same pattern
  * as `org.apache.spark.sql.graftbridge.Bridge` for Column⇄Expression).
  */
object MlPersistBridge {

  /** Write `metadata.json` (class, uid, params, defaults) for `instance`
    * at `path`, with `extra` fields merged into the top level.
    */
  def saveMetadata(instance: Params, path: String, spark: SparkSession,
      extra: Option[JObject]): Unit =
    DefaultParamsWriter.saveMetadata(instance, path, spark, extra)

  /** Load `metadata.json` at `path` (validating `className`), build the
    * instance via `mk(uid, wholeMetadataJson)` — the callback extracts
    * any extra fields and loads side artifacts — then restore the
    * persisted params onto it.
    */
  def loadAndCreate[T <: Params](path: String, spark: SparkSession,
      className: String)(mk: (String, JValue) => T): T = {
    val meta = DefaultParamsReader.loadMetadata(path, spark, className)
    val inst = mk(meta.uid, meta.metadata)
    meta.getAndSetParams(inst, None)
    inst
  }
}
