package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("encode → binary → mapPartitions decode round-trips metadata") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 320, 240, "hello"), (2L, 16, 16, "")).toDF("doc_id", "w", "h", "body")
      .select(col("doc_id"),
        Multimodal.encodePayload(col("w"), col("h"), col("body")).as("payload"))
    val meta = Multimodal.extractMeta(df).orderBy("doc_id").collect()
    assert(meta(0).getInt(1) == 320 && meta(0).getInt(2) == 240)
    assert(meta(0).getInt(3) == 5 && meta(0).getBoolean(4))
    assert(meta(1).getInt(3) == 0 && meta(1).getBoolean(4))
  }

  test("undecodable payloads yield valid=false, not errors") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "not a gft payload"), (2L, "")).toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("binary").as("payload"))
    val meta = Multimodal.extractMeta(df).orderBy("doc_id").collect()
    assert(meta.forall(!_.getBoolean(4)))
    assert(meta.forall(_.isNullAt(1)))
  }

  test("resize rewrites the binary in place: re-decode sees halved dims, subsampled body") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 100, 60, "0123456789")).toDF("doc_id", "w", "h", "body")
      .select(col("doc_id"),
        Multimodal.encodePayload(col("w"), col("h"), col("body")).as("payload"))
    val resized = Multimodal.resizePayload(df, factor = 2)
    val meta = Multimodal.extractMeta(resized).collect().head
    assert(meta.getInt(1) == 50 && meta.getInt(2) == 30) // dims halved
    assert(meta.getInt(3) == 5 && meta.getBoolean(4))    // every 2nd body byte
    val body = new String(resized.collect().head.getAs[Array[Byte]](1).drop(17), "US-ASCII")
    assert(body == "02468")
  }

  test("undecodable payloads pass through resize unchanged, flagged resized=false") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "junk")).toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("binary").as("payload"))
    val out = Multimodal.resizePayload(df, factor = 2).collect().head
    assert(!out.getBoolean(2))
    assert(new String(out.getAs[Array[Byte]](1), "US-ASCII") == "junk")
  }

  /** A real in-memory PNG (w×h RGB gradient) — generated with the JDK's
    * own writer, so the decode test exercises a genuine codec round trip
    * with no media fixture files.
    */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 37 + y * 101) & 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG payloads decode via javax.imageio: true width/height/bytes") {
    val s = spark; import s.implicits._
    val png = pngBytes(7, 5)
    val df = Seq((1L, png), (2L, pngBytes(33, 17))).toDF("doc_id", "payload")
    val meta = Multimodal.extractMeta(df).orderBy("doc_id").collect()
    assert(meta(0).getInt(1) == 7 && meta(0).getInt(2) == 5)
    assert(meta(0).getInt(3) == png.length && meta(0).getBoolean(4))
    assert(meta(1).getInt(1) == 33 && meta(1).getInt(2) == 17 && meta(1).getBoolean(4))
  }

  test("real PNG resize: output is a decodable PNG with scaled dimensions") {
    val s = spark; import s.implicits._
    val df = Seq((1L, pngBytes(8, 6))).toDF("doc_id", "payload")
    val resized = Multimodal.resizePayload(df, factor = 2)
    val out = resized.collect().head
    assert(out.getBoolean(2))
    // re-decode through the same engine path: dims halved, still an image
    val meta = Multimodal.extractMeta(resized).collect().head
    assert(meta.getInt(1) == 4 && meta.getInt(2) == 3 && meta.getBoolean(4))
  }

  /** A real in-memory WAV (silence, 16-bit PCM) via the JDK's own
    * writer — the audio decode test needs no fixture files either.
    */
  private def wavBytes(rate: Float, channels: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](frames * fmt.getFrameSize)),
      fmt, frames)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAV payloads decode via javax.sound: rate/channels/frames/duration") {
    val s = spark; import s.implicits._
    val df = Seq((1L, wavBytes(8000f, 1, 1600)), (2L, wavBytes(44100f, 2, 44100)))
      .toDF("doc_id", "payload")
    val meta = Multimodal.extractAudioMeta(df).orderBy("doc_id").collect()
    assert(meta(0).getFloat(1) == 8000f && meta(0).getInt(2) == 1)
    assert(meta(0).getLong(3) == 1600L && meta(0).getBoolean(5))
    assert(math.abs(meta(0).getDouble(4) - 0.2) < 1e-9) // 1600 frames @ 8 kHz
    assert(meta(1).getFloat(1) == 44100f && meta(1).getInt(2) == 2)
    assert(math.abs(meta(1).getDouble(4) - 1.0) < 1e-9)
  }

  test("non-audio payloads yield valid=false from the audio decoder") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "RIFFgarbage".getBytes("US-ASCII")), (2L, pngBytes(4, 4)))
      .toDF("doc_id", "payload")
    val meta = Multimodal.extractAudioMeta(df).orderBy("doc_id").collect()
    assert(meta.forall(!_.getBoolean(5)))
  }

  test("frame sampling explodes stride-spaced indices") {
    val s = spark; import s.implicits._
    val meta = Seq((1L, 10)).toDF("doc_id", "n_frames")
    val frames = Multimodal.sampleFrames(meta, "n_frames", stride = 3)
      .select("frame_idx").collect().map(_.getInt(0)).toSeq
    assert(frames == Seq(0, 3, 6, 9))
  }

  test("frameSample rewrites the frame stack: strided rows, rewritten header") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // 4 frames of 4 bytes: AAAA BBBB CCCC DDDD; stride 2 keeps AAAA CCCC
    val payloads = Seq((1L, "AAAABBBBCCCCDDDD")).toDF("doc_id", "body")
      .select(col("doc_id"),
        Multimodal.encodePayload(lit(4), lit(4), col("body")).as("payload"))
    val out = Multimodal.frameSample(payloads, stride = 2).head()
    assert(out.getAs[Int]("n_frames") == 4 && out.getAs[Int]("n_kept") == 2)
    val bytes = new String(out.getAs[Array[Byte]]("payload"), "US-ASCII")
    assert(bytes == "GFT1 00004 00002\nAAAACCCC", s"got '$bytes'")
    assert(out.getAs[Boolean]("sampled"))
    // undecodable payloads pass through untouched
    val junk = Seq((2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val j = Multimodal.frameSample(junk, stride = 2).head()
    assert(!j.getAs[Boolean]("sampled") && j.getAs[Array[Byte]]("payload").length == 3)
  }

  test("perceptual hash: real PNGs — near-identical close, different far, dedup pairs found") {
    val s = spark; import s.implicits._
    // structured gradient image + a lightly-perturbed copy + an inverted one
    def img(invert: Boolean, noise: Boolean): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(40, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 40; y <- 0 until 24) {
        val base = if ((x / 4 + y / 4) % 2 == 0) 230 else 25
        val v0 = if (invert) 255 - base else base
        val v = if (noise && (x * 24 + y) % 37 == 0) math.min(255, v0 + 6) else v0
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", out)
      out.toByteArray
    }
    val df = Seq((1L, img(invert = false, noise = false)),
      (2L, img(invert = false, noise = true)),
      (3L, img(invert = true, noise = false))).toDF("doc_id", "payload")
    val h = Multimodal.perceptualHash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) <= 3, s"near-identical pair too far: ${ham(h(1L), h(2L))}")
    assert(ham(h(1L), h(3L)) >= 20, s"inverted image too close: ${ham(h(1L), h(3L))}")
    // end-to-end: the pigeonhole pairing finds exactly the near-dup pair
    val pairs = graft.operators.Dedup.hammingPairs(
        Multimodal.perceptualHash(df).select(col("doc_id"), col("phash")),
        nBits = 60, maxHamming = 3, fpCol = "phash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("perceptual hash: GFT1 bucket semantics are exact-integer and deterministic") {
    val s = spark; import s.implicits._
    // 120 bytes: first half 200s, second half 50s → bits 0-29 set only
    val body = Array.fill(60)(200.toByte) ++ Array.fill(60)(50.toByte)
    val payload = "GFT1 00120 00001\n".getBytes("US-ASCII") ++ body
    val r = Multimodal.perceptualHash(Seq((7L, payload)).toDF("doc_id", "payload")).collect()
    assert(r.length == 1 && r.head.getBoolean(2))
    assert(r.head.getLong(1) == (1L << 30) - 1)
    // undecodable → valid=false, null hash
    val bad = Multimodal.perceptualHash(
      Seq((8L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")).collect()
    assert(!bad.head.getBoolean(2) && bad.head.isNullAt(1))
    // null id + decodable payload → valid=false (extractMeta contract)
    val nullId = Multimodal.perceptualHash(
      Seq((Option.empty[Long], payload)).toDF("doc_id", "payload")).collect()
    assert(!nullId.head.getBoolean(2))
  }
}

class RandomSplitSpec extends SparkSpec {
  test("seeded randomSplit (P10) partitions without loss and is reproducible") {
    val s = spark; import s.implicits._
    val df = (1 to 10000).toDF("x")
    val Array(a, b) = df.randomSplit(Array(0.8, 0.2), seed = 42L)
    val (na, nb) = (a.count(), b.count())
    assert(na + nb == 10000)
    assert(math.abs(na - 8000L) < 300, s"na=$na")
    val Array(a2, _) = df.randomSplit(Array(0.8, 0.2), seed = 42L)
    assert(a2.count() == na)
  }
}
