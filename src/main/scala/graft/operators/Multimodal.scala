package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata extracted
  * by a per-partition decode pass — the Spark-side pattern for media at
  * 100 TB (payloads never leave executors; only small typed metadata
  * shuffles).
  *
  * The decode itself is the ONLY non-relational step, so it is isolated
  * in `decodePartition`: a typed `mapPartitions` (the JVM analogue of
  * `mapInPandas` — batched, no per-row closure dispatch). This container
  * has no image/audio codecs, so the decoder STUB parses the engine's
  * deterministic GFT1 header format; a real deployment swaps
  * `decodeOne` for a JPEG/PNG/FLAC decoder without touching any of the
  * surrounding plumbing (schema, partitioning, batching).
  *
  * Header layout (ASCII, 17 bytes): "GFT1 wwwww hhhhh\n" then the raw
  * body bytes.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_body_bytes", IntegerType, nullable = true),
    StructField("valid", BooleanType, nullable = false)))

  /** Render a deterministic fake-media payload from (width, height,
    * body): binary column = GFT1 header + body bytes. In production the
    * payload column comes from `spark.read.format("binaryFile")` or a
    * parquet/iceberg binary column — this builder exists so the decode
    * path is testable without media fixtures.
    */
  def encodePayload(width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column,
      body: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      format_string("GFT1 %05d %05d", width, height).cast("binary"),
      lit("\n").cast("binary"),
      body.cast("binary"))

  /** STUB decoder — real codec goes here. Parses the 17-byte GFT1
    * header; returns None for payloads that don't carry it.
    */
  private def decodeOne(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload == null || payload.length < 17) return None
    val header = new String(payload, 0, 17, "US-ASCII")
    if (!header.startsWith("GFT1 ") || header(16) != '\n') return None
    try Some((header.substring(5, 10).trim.toInt,
      header.substring(11, 16).trim.toInt,
      payload.length - 17))
    catch { case _: NumberFormatException => None }
  }

  /** Typed metadata extraction over (id, payload) rows: one decode pass
    * per partition, emitting only small fixed-width metadata — payload
    * bytes are dropped before any shuffle.
    */
  def extractMeta(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    val rows: Dataset[Row] = df.select(col(idCol).cast("long"), col(payloadCol))
    val encoder = org.apache.spark.sql.Encoders.row(metaSchema)
    rows.mapPartitions { it =>
      it.map { r =>
        // null-id rows stay rows (valid=false) — getLong on a null
        // primitive would NPE and fail the task, violating the
        // "undecodable input yields valid=false, not errors" contract
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        decodeOne(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, n)) if id != null => Row(id, w, h, n, true)
          case Some((w, h, n)) => Row(null, w, h, n, false)
          case None => Row(id, null, null, null, false)
        }
      }
    }(encoder)
  }

  /** Deterministic frame sampling over a decoded-media table: keep every
    * `stride`-th frame index per document up to n_frames — pure
    * relational (sequence + explode), no decode needed.
    */
  def sampleFrames(meta: DataFrame, nFramesCol: String, stride: Int): DataFrame =
    meta.withColumn("frame_idx",
      explode(sequence(lit(0), col(nFramesCol) - 1, lit(stride))))

  /** Binary→binary media transform (the resize/transcode slot): decode,
    * scale dimensions by 1/factor, keep every `factor`-th body byte, and
    * RE-ENCODE — the payload is rewritten in place inside one partition
    * pass, never shuffled, and the output column is again an opaque
    * binary a downstream stage can decode. The byte-subsampling "
    * resampler" is the codec STUB (same contract as `decodeOne`): a real
    * deployment swaps in an image scaler without touching the plumbing.
    * Undecodable payloads pass through unchanged (valid=false shape) so
    * a corrupt row can't fail a 100 TB job.
    */
  def resizePayload(df: DataFrame, factor: Int,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    require(factor >= 1, s"factor=$factor must be >= 1")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("payload", BinaryType, nullable = true),
      StructField("resized", BooleanType, nullable = false)))
    val rows: Dataset[Row] = df.select(col(idCol).cast("long"), col(payloadCol))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    rows.mapPartitions { it =>
      it.map { r =>
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        decodeOne(payload) match {
          case Some((w, h, n)) =>
            val body = java.util.Arrays.copyOfRange(payload, 17, 17 + n)
            val sub = Array.range(0, n, factor).map(body(_))
            val header = f"GFT1 ${math.max(1, w / factor)}%05d ${math.max(1, h / factor)}%05d\n"
            Row(id, header.getBytes("US-ASCII") ++ sub, true)
          case None => Row(id, payload, false)
        }
      }
    }(encoder)
  }
}
