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
  * `mapInPandas` — batched, no per-row closure dispatch). Two codecs sit
  * behind the decode slot:
  *   - **real images** via the JDK's own `javax.imageio` readers
  *     (PNG/BMP/JPEG/GIF — no external dependency), selected by magic-
  *     byte sniff so non-image payloads never pay an ImageIO attempt;
  *   - the deterministic **GFT1** fixture format (below) for audio/video
  *     payloads this container has no codecs for — the documented STUB
  *     slot; a real deployment swaps in FLAC/H.264 without touching the
  *     surrounding plumbing (schema, partitioning, batching).
  *
  * GFT1 header layout (ASCII, 17 bytes): "GFT1 wwwww hhhhh\n" then the
  * raw body bytes.
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

  /** (width, height, body_bytes) of a payload: GFT1 header first (cheap
    * fixed-offset parse), then a real `javax.imageio` decode for payloads
    * whose magic bytes name a JDK-shipped image format. None = neither.
    */
  private[operators] def decodeOne(payload: Array[Byte]): Option[(Int, Int, Int)] =
    decodeGft1(payload).orElse(decodeImage(payload))

  private def decodeGft1(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload == null || payload.length < 17) return None
    val header = new String(payload, 0, 17, "US-ASCII")
    if (!header.startsWith("GFT1 ") || header(16) != '\n') return None
    try Some((header.substring(5, 10).trim.toInt,
      header.substring(11, 16).trim.toInt,
      payload.length - 17))
    catch { case _: NumberFormatException => None }
  }

  /** True iff the payload's magic bytes name a format the JDK's ImageIO
    * ships a reader for (PNG / BMP / JPEG / GIF) — the sniff keeps
    * non-image rows from paying a full ImageIO reader-lookup attempt.
    */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p != null && p.length >= 8 && (
      ((p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // PNG
      (p(0) == 'B' && p(1) == 'M') ||                                         // BMP
      ((p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8) ||                     // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8'))             // GIF

  // decode from memory, not an executor-local ImageIO temp file per row
  private lazy val imageIoNoCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  private def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int)] =
    readImage(payload).map(img => (img.getWidth, img.getHeight, payload.length))

  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (!looksLikeImage(payload)) return None
    imageIoNoCache
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None } // corrupt row ≠ failed task
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

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("sample_rate", FloatType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("duration_s", DoubleType, nullable = true),
    StructField("valid", BooleanType, nullable = false)))

  /** Audio metadata (sample rate / channels / frames / duration) via the
    * JDK's own `javax.sound.sampled` parser — real WAV/AIFF/AU header
    * decode with no external dependency, same partition-local plumbing
    * contract as [[extractMeta]]: payload bytes never shuffle, corrupt
    * rows yield valid=false instead of failing the task.
    */
  def extractAudioMeta(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val rows: Dataset[Row] = df.select(col(idCol).cast("long"), col(payloadCol))
    val encoder = org.apache.spark.sql.Encoders.row(audioMetaSchema)
    rows.mapPartitions { it =>
      it.map { r =>
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        decodeAudio(payload) match {
          case Some((rate, ch, frames)) =>
            val dur = if (rate > 0) frames / rate.toDouble else null
            Row(id, rate, ch, frames, dur, true)
          case None => Row(id, null, null, null, null, false)
        }
      }
    }(encoder)
  }

  private def decodeAudio(payload: Array[Byte]): Option[(Float, Int, Long)] = {
    if (payload == null || payload.length < 12) return None
    // magic sniff (same discipline as images): RIFF/WAVE, FORM/AIFF, .snd
    val riff = payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F'
    val aiff = payload(0) == 'F' && payload(1) == 'O' && payload(2) == 'R' && payload(3) == 'M'
    val au = payload(0) == '.' && payload(1) == 's' && payload(2) == 'n' && payload(3) == 'd'
    if (!(riff || aiff || au)) return None
    try {
      val in = new java.io.ByteArrayInputStream(payload)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(in)
      try {
        val f = ais.getFormat
        Some((f.getSampleRate, f.getChannels, ais.getFrameLength))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  val phashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("phash", LongType, nullable = true),
    StructField("valid", BooleanType, nullable = false)))

  /** 60-bit perceptual hash (block-mean aHash family) of a media payload:
    * bit k is set iff block k's mean exceeds the global mean. Near-
    * identical media differ in few bits — pair with
    * [[Dedup.hammingPairs]] (pigeonhole blocking, never all-pairs) for
    * the image-near-dup stage of a multimodal curation pipeline
    * (LAION/DataComp-style).
    *
    *  - real images (PNG/BMP/JPEG/GIF via `javax.imageio`): 10×6 grid of
    *    luma (299r+587g+114b)/1000 block means — the classic 2-D aHash
    *    at 60 bits.
    *  - GFT1 fixtures: 60 equal 1-D buckets over the body bytes — the
    *    deterministic stub-codec analogue, SQL-replayable so the whole
    *    hash→block→pair path gets a DuckDB oracle.
    *
    * All comparisons are exact integer cross-multiplications
    * (`blockSum·n > total·blockCnt`) — no float means, so the hash is
    * bit-identical across engines and re-runs. 60 bits (not 64) keeps
    * the fingerprint ANSI-SQL-representable (1<<63 overflows BIGINT).
    * Same partition-local contract as [[extractMeta]]: payloads never
    * shuffle, undecodable rows yield valid=false.
    */
  def perceptualHash(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val rows: Dataset[Row] = df.select(col(idCol).cast("long"), col(payloadCol))
    val encoder = org.apache.spark.sql.Encoders.row(phashSchema)
    rows.mapPartitions { it =>
      it.map { r =>
        // same contract as extractMeta: a null id demotes the row to
        // valid=false even when the payload decodes — a null-keyed
        // fingerprint would silently vanish from the pairing equi-join
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        phashOne(payload) match {
          case Some(h) if id != null => Row(id, h, true)
          case Some(h) => Row(null, h, false)
          case None => Row(id, null, false)
        }
      }
    }(encoder)
  }

  private[operators] def phashOne(payload: Array[Byte]): Option[Long] =
    decodeGft1(payload).flatMap { case (_, _, n) =>
      if (n <= 0) None
      else {
        val sums = new Array[Long](60); val cnts = new Array[Long](60)
        var i = 0; var total = 0L
        while (i < n) {
          val v = (payload(17 + i) & 0xFF).toLong
          val k = (i.toLong * 60 / n).toInt
          sums(k) += v; cnts(k) += 1; total += v; i += 1
        }
        Some(bitsOf(sums, cnts, total, n.toLong))
      }
    }.orElse(readImage(payload).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Long](60); val cnts = new Array[Long](60)
      var total = 0L
      var y = 0
      while (y < h) {
        val by = math.min(y.toLong * 6 / h, 5L).toInt
        var x = 0
        while (x < w) {
          val bx = math.min(x.toLong * 10 / w, 9L).toInt
          val rgb = img.getRGB(x, y)
          val luma = (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF)
            + 114L * (rgb & 0xFF)) / 1000L
          val k = by * 10 + bx
          sums(k) += luma; cnts(k) += 1; total += luma
          x += 1
        }
        y += 1
      }
      bitsOf(sums, cnts, total, w.toLong * h)
    })

  private def bitsOf(sums: Array[Long], cnts: Array[Long], total: Long, n: Long): Long = {
    var fp = 0L; var k = 0
    while (k < 60) {
      if (sums(k) * n > total * cnts(k)) fp |= 1L << k
      k += 1
    }
    fp
  }

  /** Deterministic frame sampling over a decoded-media table: keep every
    * `stride`-th frame index per document up to n_frames — pure
    * relational (sequence + explode), no decode needed.
    */
  def sampleFrames(meta: DataFrame, nFramesCol: String, stride: Int): DataFrame =
    meta.withColumn("frame_idx",
      explode(sequence(lit(0), col(nFramesCol) - 1, lit(stride))))

  /** Binary→binary media transform (the resize/transcode slot): decode,
    * scale dimensions by 1/factor, and RE-ENCODE — the payload is
    * rewritten in place inside one partition pass, never shuffled, and
    * the output column is again an opaque binary a downstream stage can
    * decode. Real images (PNG/BMP/JPEG/GIF) are rescaled with Graphics2D
    * bilinear drawImage and re-encoded as PNG; GFT1 fixtures keep the
    * deterministic byte-subsampling resampler (the audio/video STUB
    * slot). Undecodable payloads pass through unchanged (resized=false)
    * so a corrupt row can't fail a 100 TB job.
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
        decodeGft1(payload) match {
          case Some((w, h, n)) =>
            val body = java.util.Arrays.copyOfRange(payload, 17, 17 + n)
            val sub = Array.range(0, n, factor).map(body(_))
            val header = f"GFT1 ${math.max(1, w / factor)}%05d ${math.max(1, h / factor)}%05d\n"
            Row(id, header.getBytes("US-ASCII") ++ sub, true)
          case None => readImage(payload) match {
            case Some(img) =>
              val (nw, nh) = (math.max(1, img.getWidth / factor), math.max(1, img.getHeight / factor))
              val out = new java.awt.image.BufferedImage(
                nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
              g.dispose()
              val bytes = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bytes)
              Row(id, bytes.toByteArray, true)
            case None => Row(id, payload, false)
          }
        }
      }
    }(encoder)
  }

  /** Temporal frame sampling — the video slot of the multimodal stub
    * family. A GFT1 payload is read as a stack of `h` frames of `w`
    * bytes each (row-major), and every `stride`-th frame is kept:
    * frames 0, stride, 2·stride… re-assembled under a rewritten
    * header. Real images sample every `stride`-th PIXEL ROW (the same
    * temporal-axis semantics applied to the only axis they have) and
    * re-encode as PNG. Same per-partition discipline as
    * [[resizePayload]]: binary in, binary out, never shuffled,
    * undecodable rows pass through (sampled=false).
    *
    * @return (doc_id, n_frames int — frames in the input, n_kept int,
    *   payload binary — the sampled stack, sampled bool)
    */
  def frameSample(df: DataFrame, stride: Int,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    require(stride >= 1, s"stride=$stride must be >= 1")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("n_kept", IntegerType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("sampled", BooleanType, nullable = false)))
    val rows: Dataset[Row] = df.select(col(idCol).cast("long"), col(payloadCol))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    rows.mapPartitions { it =>
      it.map { r =>
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        decodeGft1(payload) match {
          case Some((w, h, n)) if w > 0 && n == w * h =>
            val body = java.util.Arrays.copyOfRange(payload, 17, 17 + n)
            val kept = Array.range(0, h, stride)
            val sub = kept.flatMap(f => body.slice(f * w, (f + 1) * w))
            val header = f"GFT1 $w%05d ${kept.length}%05d\n"
            Row(id, h, kept.length, header.getBytes("US-ASCII") ++ sub, true)
          case _ => readImage(payload) match {
            case Some(img) =>
              val kept = Array.range(0, img.getHeight, stride)
              val out = new java.awt.image.BufferedImage(
                img.getWidth, kept.length, java.awt.image.BufferedImage.TYPE_INT_RGB)
              kept.zipWithIndex.foreach { case (srcY, dstY) =>
                (0 until img.getWidth).foreach(x => out.setRGB(x, dstY, img.getRGB(x, srcY)))
              }
              val bytes = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bytes)
              Row(id, img.getHeight, kept.length, bytes.toByteArray, true)
            case None => Row(id, 0, 0, payload, false)
          }
        }
      }
    }(encoder)
  }
}
