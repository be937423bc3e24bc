package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The image path is REAL end-to-end: [[Bmp.encodeGray]] writes genuine
  * 24-bit BMP containers, [[ImageIoCodec]] decodes them back to pixels
  * through `javax.imageio` (public JDK API, no extra dependency), and
  * [[decodeImages]]/[[sampleImageRows]] derive per-image and per-row
  * luminance statistics from the decoded pixels. Audio/video codecs
  * remain stubbed behind the same [[MediaCodec]] seam (this container
  * has no ffmpeg) — swap in a JNI/javacpp implementation without
  * touching the plumbing.
  *
  * Scale notes: decode runs in `mapPartitions` so a real codec
  * amortizes init per partition (the Scala analogue of mapInPandas
  * batching); binary payloads never shuffle — all derived columns are
  * computed before any wide transform, and only compact features flow
  * downstream.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)
  ))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)
  ))

  /** A decoded raster: grayscale pixel values 0..255, row-major. */
  case class DecodedImage(width: Int, height: Int, gray: Array[Int])

  /** A decoded audio clip: mono PCM sample values, native range
    * (-32768..32767 for 16-bit sources). */
  case class DecodedAudio(sampleRate: Int, samples: Array[Int])

  /** The codec seam: feature extraction over raw payload bytes, plus
    * optional real image/audio decodes (None = this codec cannot decode
    * the payload — stub codecs and mismatched formats). */
  trait MediaCodec extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Float]
    def decodeImage(payload: Array[Byte]): Option[DecodedImage] = None
    def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] = None
  }

  object StubCodec extends MediaCodec {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload == null || payload.isEmpty) return out
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        out(i % dim) += b / 255.0f
        i += 1
      }
      val n = math.max(1, payload.length / dim)
      var j = 0
      while (j < dim) { out(j) /= n; j += 1 }
      out
    }
  }

  /** Minimal deterministic 24-bit BMP writer (public Windows bitmap
    * format: 14-byte file header + 40-byte BITMAPINFOHEADER + bottom-up
    * BGR rows padded to 4 bytes). Byte-for-byte reproducible — the
    * fixture generator for the real decode path. */
  object Bmp {
    def encodeGray(w: Int, h: Int, lum: (Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0, "empty image")
      val rowBytes = w * 3
      val pad = (4 - rowBytes % 4) % 4
      val imgSize = (rowBytes + pad) * h
      val size = 54 + imgSize
      val buf = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(size)
        .putShort(0).putShort(0).putInt(54)
      buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(imgSize).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      var y = h - 1
      while (y >= 0) { // bottom-up row order
        var x = 0
        while (x < w) {
          val v = (lum(x, y) & 0xff).toByte
          buf.put(v).put(v).put(v) // B, G, R
          x += 1
        }
        var p = 0
        while (p < pad) { buf.put(0.toByte); p += 1 }
        y -= 1
      }
      buf.array()
    }
  }

  /** Minimal deterministic WAV/RIFF writer (public wave format: 12-byte
    * RIFF header + 24-byte PCM `fmt ` chunk + `data` chunk), 16-bit
    * signed little-endian mono. Byte-for-byte reproducible — the fixture
    * generator for the real audio-decode path, mirroring [[Bmp]] for
    * images. */
  object Wav {
    def encodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      require(sampleRate > 0, "sampleRate must be positive")
      val dataSize = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2)            // block align
        .putShort(16)           // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
      var i = 0
      while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
      buf.array()
    }
  }

  /** Real audio decode through `javax.sound.sampled` (JDK-builtin WAV/
    * AIFF/AU readers — same no-new-dependency play as [[ImageIoCodec]]).
    * Accepts 16-bit signed PCM mono; anything the JDK reader rejects or
    * any other sample layout decodes to None, never a task-killing
    * exception. */
  object JavaSoundCodec extends MediaCodec {
    def features(payload: Array[Byte], dim: Int): Array[Float] =
      decodeAudio(payload) match {
        case None => StubCodec.features(payload, dim)
        case Some(da) =>
          // per-band mean |amplitude| over `dim` time bands — the audio
          // analogue of ImageIoCodec's horizontal luminance bands
          val out = new Array[Float](dim)
          val counts = new Array[Int](dim)
          val n = da.samples.length
          var i = 0
          while (i < n) {
            val band = math.min(dim - 1, i * dim / math.max(1, n))
            out(band) += math.abs(da.samples(i)) / 32768.0f
            counts(band) += 1
            i += 1
          }
          var j = 0
          while (j < dim) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
          out
      }

    override def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] = {
      if (payload == null || payload.isEmpty) return None
      var ais: javax.sound.sampled.AudioInputStream = null
      try {
        ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
        if (!ok) None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            // the first byte of a frame is the high byte iff big-endian;
            // .toInt on the high byte sign-extends, preserving negatives
            samples(i) =
              if (fmt.isBigEndian)
                (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff)
              else
                (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
            i += 1
          }
          Some(DecodedAudio(fmt.getSampleRate.toInt, samples))
        }
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      } finally {
        if (ais != null) ais.close()
      }
    }
  }

  /** Real image decode through `javax.imageio` (JDK-builtin readers:
    * BMP, PNG, GIF, JPEG). Grayscale extraction is exact for our
    * gray-BMP fixtures (r == g == b) and integer BT.601 luma otherwise.
    * Feature extraction = per-band mean luminance over `dim` horizontal
    * bands of the decoded raster (real pixel features), falling back to
    * the byte-statistics stub for payloads no JDK reader accepts. */
  object ImageIoCodec extends MediaCodec {
    override def decodeImage(payload: Array[Byte]): Option[DecodedImage] = {
      if (payload == null || payload.isEmpty) return None
      // a payload with a recognized magic but an unparseable body makes
      // ImageIO.read THROW (IIOException/EOFException) rather than
      // return null — e.g. png-magic + text from syntheticMediaTable, or
      // a truncated BMP. The Option contract covers both failure modes:
      // undecodable means None, never a task-killing exception.
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException | _: RuntimeException => null }
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val gray = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            gray(y * w + x) =
              if (r == g && g == b) r else (299 * r + 587 * g + 114 * b) / 1000
            x += 1
          }
          y += 1
        }
        Some(DecodedImage(w, h, gray))
      }
    }

    def features(payload: Array[Byte], dim: Int): Array[Float] =
      decodeImage(payload) match {
        case None => StubCodec.features(payload, dim)
        case Some(di) =>
          val out = new Array[Float](dim)
          val counts = new Array[Int](dim)
          var y = 0
          while (y < di.height) {
            val band = math.min(dim - 1, y * dim / di.height)
            var x = 0
            while (x < di.width) {
              out(band) += di.gray(y * di.width + x) / 255.0f
              counts(band) += 1
              x += 1
            }
            y += 1
          }
          var j = 0
          while (j < dim) {
            if (counts(j) > 0) out(j) /= counts(j)
            j += 1
          }
          out
      }
  }

  /** Deterministic grayscale fixture pixel: (id·31 + x·7 + y·13) mod 256
    * — pure integer arithmetic an oracle can replay analytically. */
  def fixturePixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Real-image media table: one genuine BMP per input id, pixels from
    * [[fixturePixel]], dimensions 16+id%17 × 16+(id·7)%13. The payloads
    * are decodable containers, so the decode → feature path downstream
    * is the real one end-to-end. */
  def syntheticImageTable(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = 16 + (id % 17).toInt
          val h = 16 + ((id * 7) % 13).toInt
          val payload = Bmp.encodeGray(w, h, (x, y) => fixturePixel(id, x, y))
          Row(id, payload, Row("bmp", w, h, null))
        }
      }(enc)
  }

  /** Deterministic PCM fixture sample: ((id·31 + i·17) mod 4096) − 2048
    * — pure integer arithmetic an oracle can replay analytically; values
    * sit inside the 16-bit range so encode→decode is lossless. */
  def fixtureSample(id: Long, i: Int): Int =
    ((id * 31 + i * 17) % 4096).toInt - 2048

  /** Real-audio media table: one genuine 16-bit PCM mono WAV per input
    * id, samples from [[fixtureSample]], rate 8000+(id%3)·4000 Hz,
    * length 256+(id·7)%97 samples. The payloads are decodable RIFF/WAVE
    * containers, so the decode → stats path downstream is the real one
    * end-to-end (the audio analogue of [[syntheticImageTable]]). */
  def syntheticAudioTable(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val rate = 8000 + (id % 3).toInt * 4000
          val n = 256 + ((id * 7) % 97).toInt
          val samples = Array.tabulate(n)(i => fixtureSample(id, i).toShort)
          val payload = Wav.encodePcm16(rate, samples)
          Row(id, payload, Row("wav", null, null, n * 1000L / rate))
        }
      }(enc)
  }

  /** Decode each payload and derive per-clip audio statistics:
    * (media_id, sample_rate, n_samples, duration_ms, sum_sq, rms,
    * n_bytes) — undecodable payloads keep their byte count with null
    * audio columns. Batched per partition; payload bytes never shuffle —
    * only scalars flow downstream. */
  def decodeAudioClips(media: DataFrame,
      codec: MediaCodec = JavaSoundCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("duration_ms", LongType),
      StructField("sum_sq", LongType),
      StructField("rms", DoubleType),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val nBytes = if (payload == null) 0L else payload.length.toLong
          codec.decodeAudio(payload) match {
            case Some(da) if da.samples.nonEmpty =>
              var sumSq = 0L
              var i = 0
              while (i < da.samples.length) {
                val s = da.samples(i).toLong
                sumSq += s * s
                i += 1
              }
              val n = da.samples.length.toLong
              Row(id, da.sampleRate, n, n * 1000L / da.sampleRate, sumSq,
                math.sqrt(sumSq.toDouble / n), nBytes)
            case _ => Row(id, null, null, null, null, null, nBytes)
          }
        }
      }(enc)
  }

  /** Decode each payload and derive per-image raster statistics:
    * (media_id, width, height, mean_lum, n_bytes) — undecodable
    * payloads keep their byte count with null raster columns. Batched
    * per partition; only scalars flow downstream. */
  def decodeImages(media: DataFrame,
      codec: MediaCodec = ImageIoCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_lum", DoubleType),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val nBytes = if (payload == null) 0L else payload.length.toLong
          codec.decodeImage(payload) match {
            case Some(di) =>
              var s = 0L
              var i = 0
              while (i < di.gray.length) { s += di.gray(i); i += 1 }
              Row(id, di.width, di.height,
                s.toDouble / (di.width.toLong * di.height), nBytes)
            case None => Row(id, null, null, null, nBytes)
          }
        }
      }(enc)
  }

  /** Frame sampling over REAL pixel data: treat the decoded raster's
    * scanlines as a frame sequence (the image analogue of video frame
    * sampling — same cadence/cap contract as [[sampleFrames]]) and emit
    * one row per sampled line with its mean luminance. Payload bytes
    * never fan out — only (id, frame_idx, row_y, row_mean_lum) rows. */
  def sampleImageRows(media: DataFrame, everyN: Int, maxFrames: Int = 32,
      codec: MediaCodec = ImageIoCodec): DataFrame = {
    require(everyN > 0, "everyN must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("row_y", IntegerType, nullable = false),
      StructField("row_mean_lum", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          codec.decodeImage(payload) match {
            case None => Iterator.empty
            case Some(di) =>
              Iterator.tabulate(
                  math.min(maxFrames, (di.height + everyN - 1) / everyN)) {
                idx =>
                  val y = idx * everyN
                  var s = 0L
                  var x = 0
                  while (x < di.width) { s += di.gray(y * di.width + x); x += 1 }
                  Row(id, idx, y, s.toDouble / di.width)
              }
          }
        }
      }(enc)
  }

  // container magic bytes (public file-format signatures)
  private val jpegMagic = Array(0xFF, 0xD8, 0xFF).map(_.toByte)
  private val pngMagic =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
  private val riffMagic = "RIFF".getBytes("US-ASCII")
  private val waveTag = "WAVE".getBytes("US-ASCII")

  /** Build a media table from any (id, string) source — the test stand-in
    * for reading real image/audio files: payload = the format's REAL
    * magic-byte header + utf-8 content bytes (so byte-level operators
    * like [[detectFormat]] exercise genuine container signatures),
    * metadata synthesized with integer arithmetic on the ID — fully
    * replayable by an external oracle (no engine-specific hash). */
  def syntheticMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val fmt = element_at(array(lit("jpeg"), lit("png"), lit("wav")),
      (pmod(id, lit(3)) + 1).cast("int"))
    val header = when(fmt === "jpeg", lit(jpegMagic))
      .when(fmt === "png", lit(pngMagic))
      // RIFF<size little-endian, unknown here: zeros>WAVE
      .otherwise(lit(riffMagic ++ Array[Byte](0, 0, 0, 0) ++ waveTag))
    df.select(
      id.as("media_id"),
      concat(header, encode(col(textCol), "utf-8")).as("payload"),
      struct(
        fmt.as("format"),
        (pmod(id, lit(1024)) + 32).cast("int").as("width"),
        (pmod(id * 7, lit(1024)) + 32).cast("int").as("height"),
        pmod(id * 37, lit(600000)).as("duration_ms")
      ).as("meta"))
  }

  /** Container format from payload magic bytes — a REAL byte-level
    * detector (no codec needed): JPEG FF D8 FF, PNG 89 50 4E 47 …,
    * WAV = RIFF….WAVE; anything else → "unknown". Pure Column
    * comparisons on binary prefixes — codegen, pushup-friendly, and the
    * first line of defense against mislabeled/corrupt media at ingest. */
  def detectFormat(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(substring(payload, 1, 3) === lit(jpegMagic), "jpeg")
      .when(substring(payload, 1, 8) === lit(pngMagic), "png")
      .when(substring(payload, 1, 4) === lit(riffMagic) &&
        substring(payload, 9, 4) === lit(waveTag), "wav")
      .otherwise("unknown")

  /** Shannon entropy (bits/byte, 0-8) of the payload's byte histogram —
    * a codec-free signal for corrupt/compressed/encrypted blobs (true
    * media sits near its container's typical entropy; truncated or
    * zero-filled payloads fall out of band). Custom expression: one pass
    * over the bytes per row. */
  def byteEntropy(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ByteEntropy.of(payload)

  /** Decode + feature-extract: (media_id, features array<float>, n_bytes).
    * Batched per partition; codec init happens once per partition, not
    * per row. */
  def extractFeatures(media: DataFrame, dim: Int = 16,
      codec: MediaCodec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition codec scope (a real codec opens its context here)
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val nBytes = if (payload == null) 0L else payload.length.toLong
          Row(id, codec.features(payload, dim).toSeq, nBytes)
        }
      }(enc)
  }

  /** Resize stage (stub): records the target box in the metadata and
    * passes the payload through — the schema/flow a real resize has. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.format"),
      least(col("meta.width"), lit(maxW)).as("width"),
      least(col("meta.height"), lit(maxH)).as("height"),
      col("meta.duration_ms")))

  /** Frame-sample stage: one output row per sampled frame timestamp
    * (every `everyMs` over the clip duration, capped). The payload is NOT
    * duplicated per frame — only (media_id, frame_ts) flows on. */
  def sampleFrames(media: DataFrame, everyMs: Long, maxFrames: Int = 32): DataFrame =
    media.select(
        col("media_id"),
        explode(
          slice(
            sequence(lit(0L), coalesce(col("meta.duration_ms"), lit(0L)),
              lit(everyMs)),
            1, maxFrames)).as("frame_ts"))
}
