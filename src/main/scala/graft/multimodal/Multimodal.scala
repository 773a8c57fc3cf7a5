package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside, and
  * decode/resize run per-partition (one codec context per partition,
  * batch-shaped exactly like PySpark's `mapInPandas` — the ONE seam in
  * this library where `mapPartitions` is the right tool, because the
  * work is per-row imperative byte decoding, not relational).
  *
  * Image (PNG/BMP/JPEG/GIF) and WAV audio decode are REAL, via the
  * pure-JDK codecs (`javax.imageio`, `javax.sound.sampled`) — no
  * external libraries. Video decode is real end to end for the
  * Motion-JPEG tracks this corpus carries: [[Mp4]] parses the
  * ISO-BMFF container (box walk, mvhd timing, tkhd geometry) in pure
  * bytes, and the mdat's MJPEG samples decode to real per-frame pixel
  * statistics ([[decode]] → `mjpegFeatures`). Codecs the JDK cannot
  * decode (H.264, VP9, …) fall back to a clearly-documented
  * deterministic stand-in ([[fakeVideoFeatures]]) — a real
  * ffmpeg/JNI binding would replace exactly that one function.
  */
object Multimodal {

  /** ImageIO's default stream cache is DISK-backed: every
    * `ImageIO.read/write(raw stream)` creates and deletes a temp FILE
    * per call, even when the stream is an in-memory byte array. Per-row
    * temp-file churn across 32 executor threads serializes on tmp-dir
    * metadata and grows with row volume — measured as the super-linear
    * term in x_multimodal's sf10 curve (isolated 11.7× wall for 10×
    * data; SCALE_CURVE.md round 14, certified fixed at sf30). Payloads
    * here are KB-sized, so the in-memory cache is strictly better.
    *
    * SCOPED, not global (round-15 review fix): every call site hands
    * ImageIO an explicit `MemoryCacheImageInput/OutputStream` instead
    * of flipping the process-wide `ImageIO.setUseCache(false)` — the
    * flag mutation leaked to every OTHER ImageIO user in the executor
    * JVM (a user UDF decoding multi-MB images would silently lose
    * disk-backed streaming and buffer whole images on heap). With an
    * explicit ImageInput/OutputStream, ImageIO performs no cache
    * wrapping at all, so these helpers are executor-local by
    * construction — nothing to initialize per partition. */
  private def readImage(bytes: Array[Byte], off: Int = 0, len: Int = -1): java.awt.image.BufferedImage = {
    val n = if (len < 0) bytes.length - off else len
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes, off, n))
    // ImageIO.read(ImageInputStream) closes the stream itself except on
    // a null (undecodable) result — tolerate the double close
    try javax.imageio.ImageIO.read(iis)
    finally { try iis.close() catch { case _: java.io.IOException => () } }
  }

  /** Encode `img` as `fmt` into fresh bytes through an explicit
    * in-memory output stream (close() flushes the cache to `bos`). */
  private def writeImage(img: java.awt.image.RenderedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try require(javax.imageio.ImageIO.write(img, fmt, ios), s"no JDK encoder for $fmt")
    finally ios.close()
    bos.toByteArray
  }

  /** Metadata carried next to every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /** Wrap a text table into a payload table: payload = utf-8 bytes
    * (the chunking/fingerprint plumbing path; also the stand-in "video"
    * byte stream), meta = typed struct. */
  def asPayloadTable(df: DataFrame, idCol: String, textCol: String,
      modality: String = "video", mime: String = "video/mp4"): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.select(
      col(idCol).as("media_id"),
      payload.as("payload"),
      struct(
        lit(modality).as("modality"),
        lit(mime).as("mime"),
        length(payload).cast("long").as("n_bytes"),
        md5(payload).as("checksum")).as("meta"))
  }

  /** Synthesize a REAL mixed-modality media table from an id column —
    * the test-fixture generator (the container ships no media files):
    * id % 3 == 0 → a solid-color PNG/BMP whose dimensions and fill
    * color are closed-form in the id; == 1 → a constant-amplitude
    * 16-bit PCM WAV whose rate/length/amplitude are closed-form;
    * == 2 → a valid ISO-BMFF (MP4) container whose timing and
    * geometry are closed-form. Because every parameter is arithmetic
    * in the id, an oracle can verify the ENCODE→DECODE round trip
    * through the actual JDK codecs (and the Mp4 box parser) with
    * plain SQL. */
  def synthesize(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", MetaSchema, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.get(idIdx) match {
          case l: Long => l; case i: Int => i.toLong
          case other => throw new IllegalArgumentException(
            s"synthesize needs an integral id, got $other")
        }
        val (bytes, modality, mime) = synthesizeOne(id)
        Row(id, bytes, Row(modality, mime, bytes.length.toLong, md5Hex(bytes)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Closed-form media parameters (shared by the generator, the specs
    * and the SQL oracle — one definition, three consumers). */
  // floorMod throughout: Scala % is negative for negative ids, and a
  // negative channel value makes java.awt.Color THROW inside the
  // executor — the decode paths promise no executor crashes, so the
  // generator must not crash on them either. Fixture ids are
  // non-negative, where floorMod == % and the SQL oracles agree.
  private def fm(v: Long, m: Long): Long = Math.floorMod(v, m)
  def imageDims(id: Long): (Int, Int) =
    (16 + fm(id, 32).toInt, 16 + fm(Math.floorDiv(id, 32), 16).toInt)
  def imageColor(id: Long): (Int, Int, Int) =
    (fm(id, 256).toInt, fm(id * 7, 256).toInt, fm(id * 13, 256).toInt)
  /** (timescale, durationUnits, width, height) — all oracle-derivable. */
  def videoParams(id: Long): (Int, Int, Int, Int) =
    (1000 + fm(id, 8).toInt * 500, 24 + fm(id, 240).toInt,
      320 + fm(id, 16).toInt * 8, 180 + fm(id, 9).toInt * 20)

  def audioParams(id: Long): (Int, Int, Int) = // (sampleRate, nSamples, amplitude)
    (8000, 160 + fm(id, 320).toInt, (fm(id, 200).toInt - 100) * 163)

  private def synthesizeOne(id: Long): (Array[Byte], String, String) = fm(id, 3) match {
    case 0 =>
      val (w, h) = imageDims(id)
      val (r, g, b) = imageColor(id)
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = img.createGraphics()
      gfx.setColor(new java.awt.Color(r, g, b)); gfx.fillRect(0, 0, w, h); gfx.dispose()
      // alternate container formats so BOTH JDK image codecs are on the
      // round-trip path (both lossless — the color oracle stays exact)
      val fmt = if (fm(id, 2) == 0) "png" else "bmp"
      (writeImage(img, fmt), "image", s"image/$fmt")
    case 1 =>
      val (sr, n, amp) = audioParams(id)
      val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) { // constant-amplitude signal, little-endian 16-bit
        pcm(i * 2) = (amp & 0xFF).toByte
        pcm(i * 2 + 1) = ((amp >> 8) & 0xFF).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      (bos.toByteArray, "audio", "audio/wav")
    case _ =>
      // a REAL (valid-by-construction) ISO-BMFF container: box
      // structure, mvhd timing and tkhd geometry parse back through
      // [[Mp4.parse]]. The mdat carries REAL coded samples —
      // Motion-JPEG (concatenated baseline JPEG frames, the classic
      // MJPEG storage shape), the one video codec the bare JDK can
      // both encode and decode. Frames are thumbnail-scale (tkhd
      // geometry / 10 — a proxy track; container display size ≠ coded
      // size is normal ISO-BMFF), solid gray varying per frame so
      // decoded pixel statistics are predictable up to JPEG's DC
      // quantization.
      val (tsc, dur, w, h) = videoParams(id)
      val bos = new ByteArrayOutputStream()
      var f = 0
      while (f < VideoFrames) {
        val g = videoFrameGray(id, f)
        val img = new java.awt.image.BufferedImage(
          math.max(w / 10, 8), math.max(h / 10, 8),
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g2 = img.createGraphics()
        g2.setColor(new java.awt.Color(g, g, g))
        g2.fillRect(0, 0, img.getWidth, img.getHeight)
        g2.dispose()
        bos.write(writeImage(img, "jpg"))
        f += 1
      }
      (Mp4.build(tsc, dur, w, h, bos.toByteArray), "video", "video/mp4")
  }

  /** Frames per synthesized MJPEG track. */
  val VideoFrames: Int = 4

  /** Solid gray level of synthesized video frame `f` of media `id` —
    * floorMod like every other param derivation here, so a negative id
    * can never hand java.awt.Color an out-of-range component. */
  def videoFrameGray(id: Long, f: Int): Int =
    java.lang.Math.floorMod(id * 7 + f * 31, 256L).toInt

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Schema the decoder appends: image rows fill width/height/channels,
    * audio rows fill sample_rate/n_samples/channels, video rows fill
    * width/height (tkhd) + timebase (mvhd) and a fake feature vector. */
  private def decodedFields(inSchema: StructType): StructType =
    StructType(inSchema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_samples", LongType),
      StructField("features", ArrayType(FloatType))))

  /** REAL decode for image (javax.imageio: PNG/BMP/JPEG/GIF), WAV
    * audio (javax.sound.sampled), and MP4 container metadata ([[Mp4]]);
    * only video FRAME features use the documented deterministic fake.
    * Dispatch is on `meta.mime`. One decoder
    * context per partition; constant memory per row (media bytes are
    * decoded and released row by row, never collected). */
  def decode(payloads: DataFrame, videoFeatureDim: Int = 8): DataFrame = {
    val spark = payloads.sparkSession
    val inSchema = payloads.schema
    val outSchema = decodedFields(inSchema)
    val idxPayload = inSchema.fieldIndex("payload")
    val idxMeta = inSchema.fieldIndex("meta")
    // resolve against the INPUT's meta struct, not the static
    // MetaSchema: a caller-built meta with the same fields in another
    // order would otherwise silently read the wrong slot
    val idxMime = inSchema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldIndex("mime")
    val rdd = payloads.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idxPayload)
        val mime = row.getStruct(idxMeta).getString(idxMime)
        val d =
          if (mime.startsWith("image/")) decodeImage(bytes)
          else if (mime == "audio/wav" || mime == "audio/x-wav") decodeWav(bytes)
          else if (mime == "video/mp4") decodeMp4(bytes, videoFeatureDim)
          else Row(null, null, null, null, null, fakeVideoFeatures(bytes, videoFeatureDim))
        Row.fromSeq(row.toSeq ++ d.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** javax.imageio decode → dimensions, band count, per-band pixel
    * means (exact integers for solid-color lossless fixtures, which is
    * what lets a SQL oracle check real decoded pixel data). */
  private def decodeImage(bytes: Array[Byte]): Row = {
    val img = readImage(bytes)
    require(img != null, "javax.imageio could not decode image payload")
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    val sums = new Array[Double](bands)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) { sums(b) += raster.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    val means = sums.map(s => (s / (w.toLong * h)).toFloat).toSeq
    Row(w, h, bands, null, null, means)
  }

  /** javax.sound.sampled WAV decode → rate/frames/channels + signal
    * mean and RMS over the 16-bit PCM samples. */
  private def decodeWav(bytes: Array[Byte]): Row = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16, s"fixture WAVs are 16-bit, got ${fmt.getSampleSizeInBits}")
      val frames = ais.getFrameLength
      val channels = fmt.getChannels
      val data = ais.readAllBytes()
      val n = data.length / 2
      var sum = 0.0; var sumSq = 0.0
      var i = 0
      while (i < n) {
        val lo = data(i * 2) & 0xFF
        val hi = data(i * 2 + 1).toInt // sign-extends: little-endian 16-bit
        val s = (hi << 8) | lo
        sum += s; sumSq += s.toDouble * s
        i += 1
      }
      val mean = if (n == 0) 0.0 else sum / n
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
      Row(null, null, channels, fmt.getSampleRate.toInt, frames,
        Seq(mean.toFloat, rms.toFloat))
    } finally ais.close()
  }

  /** REAL ISO-BMFF container parse ([[Mp4.parse]]): tkhd display
    * geometry → width/height, mvhd timebase → sample_rate (units/s)
    * and n_samples (duration units) — the audio columns' closest
    * video analogs, so the decode schema stays one struct. Only the
    * FEATURE vector remains fake (frame decode needs codecs the JDK
    * lacks); it runs over the extracted mdat payload. Unparseable
    * bytes degrade to metadata-less rows, never an executor crash. */
  private def decodeMp4(bytes: Array[Byte], featureDim: Int): Row =
    Mp4.parse(bytes) match {
      case Some(info) => Row(info.width, info.height, null,
        info.timescale, info.duration,
        // REAL frame features when the mdat holds Motion-JPEG samples
        // (per-frame decoded pixel mean + contrast); any other codec
        // falls back to the deterministic stand-in — the JDK ships no
        // H.264/VP9 decoder. Both run over the mdat RANGE of the
        // original bytes — no second copy of a multi-MB payload per row
        mjpegFeatures(bytes, info.mdatStart, info.mdatEnd, featureDim)
          .getOrElse(fakeVideoFeatures(bytes, featureDim, info.mdatStart, info.mdatEnd)))
      case None => Row(null, null, null, null, null, fakeVideoFeatures(bytes, featureDim))
    }

  /** Byte ranges of the JPEG frames in an MJPEG sample run: frames
    * start at SOI (FF D8 FF) and extend to the next SOI (or range
    * end). FF bytes inside entropy-coded data are escaped (FF 00), so
    * a bare FF D8 FF triple only opens a frame. */
  private[multimodal] def splitJpegFrames(
      bytes: Array[Byte], from: Int, until: Int): Seq[(Int, Int)] = {
    val starts = scala.collection.mutable.ArrayBuffer[Int]()
    var i = math.max(from, 0)
    val end = math.min(until, bytes.length)
    while (i < end - 2) {
      if ((bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xD8 &&
          (bytes(i + 2) & 0xFF) == 0xFF) starts += i
      i += 1
    }
    starts.toSeq.zip(starts.drop(1) :+ end)
  }

  /** REAL video frame features from Motion-JPEG samples: per decoded
    * frame, (band-0 pixel mean, band-0 pixel std) — mean tracks the
    * frame's brightness, std its contrast (≈0 for the solid-gray
    * fixtures, up to JPEG quantization). The vector holds at most
    * `featureDim/2` (mean, std) pairs: when a track decodes MORE frames
    * than that, frames are mean-pooled into `featureDim/2` evenly-sized
    * temporal segments (in order), so long tracks keep whole-track
    * signal instead of silently dropping everything after the first
    * `featureDim/2` frames. Tracks with ≤ featureDim/2 frames (all
    * fixtures) are unchanged: one pair per frame, zero-padded. None
    * when the mdat holds no decodable JPEG frames — the caller falls
    * back to the stand-in. */
  private def mjpegFeatures(bytes: Array[Byte], from: Int, until: Int,
      featureDim: Int): Option[Seq[Float]] = {
    val stats = splitJpegFrames(bytes, from, until).flatMap { case (s, e) =>
      val img = readImage(bytes, s, e - s)
      if (img == null) None
      else {
        val r = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0.0; var sumSq = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = r.getSample(x, y, 0).toDouble
            sum += v; sumSq += v * v
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        val mean = sum / n
        val std = math.sqrt(math.max(sumSq / n - mean * mean, 0.0))
        Some((mean.toFloat, std.toFloat))
      }
    }
    if (stats.isEmpty) None
    else {
      val slots = math.max(featureDim / 2, 1)
      val pooled =
        if (stats.length <= slots) stats
        else {
          // temporal mean-pool: segment k covers frames
          // [k*n/slots, (k+1)*n/slots) — every frame lands in exactly
          // one segment, order preserved
          val n = stats.length
          (0 until slots).map { k =>
            val seg = stats.slice(k * n / slots, (k + 1) * n / slots)
            (seg.map(_._1).sum / seg.length, seg.map(_._2).sum / seg.length)
          }
        }
      Some((pooled.flatMap(t => Seq(t._1, t._2)) ++
        Seq.fill(featureDim)(0f)).take(featureDim))
    }
  }

  /** The stand-in for codecs the JDK cannot decode (H.264 etc.):
    * deterministic chunk-hash features so pipelines exercise the exact
    * shape a real ffmpeg/JNI binding would plug into. Synthesized
    * MJPEG tracks never reach this — their frames decode for real. */
  def fakeVideoFeatures(bytes: Array[Byte], featureDim: Int,
      from: Int = 0, until: Int = -1): Seq[Float] = {
    val end = if (until < 0) bytes.length else until
    val len = end - from
    (0 until featureDim).map { i =>
      val s = from + i * len / featureDim
      val e = from + (i + 1) * len / featureDim
      // Arrays.hashCode over the range, computed in place (no chunk copy)
      var h = 1; var j = s
      while (j < e) { h = 31 * h + bytes(j); j += 1 }
      h.toFloat / Int.MaxValue
    }
  }

  /** Frame-sampling plumbing for video-like payloads: split the payload
    * into `frames` equal byte-ranges and explode one row per sampled
    * frame — the partition/batch shape of real frame extraction. */
  def sampleFrames(payloads: DataFrame, frames: Int): DataFrame =
    payloads
      .withColumn("frame_idx", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("frame_bytes",
        substring(col("payload"),
          (col("frame_idx") * (col("meta.n_bytes") / frames) + 1).cast("int"),
          greatest((col("meta.n_bytes") / frames).cast("int"), lit(1))))
      .withColumn("frame_checksum", md5(col("frame_bytes")))

  /** REAL image resize (pure JDK): decode, scale through Graphics2D
    * bilinear, re-encode PNG. Non-image payloads keep a deterministic
    * byte-range thumbnail (there is nothing to rescale). */
  def resize(decoded: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = decoded.sparkSession
    val inSchema = decoded.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("thumb_width", IntegerType, nullable = false),
      StructField("thumb_height", IntegerType, nullable = false),
      StructField("thumb", BinaryType)))
    val idxPayload = inSchema.fieldIndex("payload")
    val idxMeta = inSchema.fieldIndex("meta")
    // resolve against the INPUT's meta struct, not the static
    // MetaSchema: a caller-built meta with the same fields in another
    // order would otherwise silently read the wrong slot
    val idxMime = inSchema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldIndex("mime")
    val rdd = decoded.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idxPayload)
        val mime = row.getStruct(idxMeta).getString(idxMime)
        val thumb =
          if (mime.startsWith("image/")) {
            val img = readImage(bytes)
            require(img != null, "javax.imageio could not decode image payload")
            val scaled = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val gfx = scaled.createGraphics()
            gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            gfx.drawImage(img, 0, 0, w, h, null); gfx.dispose()
            writeImage(scaled, "png")
          } else bytes.take(math.max(1, w * h / 64))
        Row.fromSeq(row.toSeq ++ Seq(w, h, thumb))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
