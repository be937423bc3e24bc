package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * All three modalities are REAL end-to-end, pure-JVM (no ffmpeg in
  * this container, no new dependency):
  *  - images: [[Bmp.encodeGray]] writes genuine 24-bit BMP containers,
  *    [[ImageIoCodec]] decodes them through `javax.imageio`;
  *  - audio: [[Wav.encodePcm16]] writes genuine RIFF/WAVE PCM,
  *    [[JavaSoundCodec]] decodes through `javax.sound.sampled`;
  *  - video: [[Avi.encodeDib]]/[[Avi.encodeMjpeg]] write genuine
  *    RIFF/AVI containers (uncompressed-DIB and MJPEG codec variants),
  *    [[RiffVideoCodec]] walks the chunk tree and decodes frames
  *    (DIB rasters exactly; MJPEG through `javax.imageio`).
  * Exotic codecs (H.264 etc.) slot in behind the same [[MediaCodec]]
  * seam as a JNI/javacpp implementation without touching the plumbing.
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

  /** A decoded video clip: per-frame grayscale rasters (row-major
    * 0..255) plus the container's frame timing. */
  case class DecodedVideo(width: Int, height: Int, microSecPerFrame: Long,
      frames: IndexedSeq[Array[Int]])

  /** The codec seam: feature extraction over raw payload bytes, plus
    * optional real image/audio/video decodes (None = this codec cannot
    * decode the payload — stub codecs and mismatched formats). */
  trait MediaCodec extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Float]
    def decodeImage(payload: Array[Byte]): Option[DecodedImage] = None
    def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] = None
    def decodeVideo(payload: Array[Byte]): Option[DecodedVideo] = None
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

  /** Minimal deterministic AVI/RIFF writer (public format: RIFF('AVI ')
    * with LIST hdrl [avih + LIST strl [strh 'vids' + strf
    * BITMAPINFOHEADER]] and LIST movi of per-frame chunks). Two real AVI
    * codec variants:
    *  - `encodeDib`: uncompressed 24-bit DIB frames ('00db' chunks, the
    *    'DIB ' handler) — bottom-up BGR rows padded to 4 bytes, exactly a
    *    headerless [[Bmp]] raster per frame. Byte-for-byte reproducible —
    *    the fixture generator for the analytic video oracle.
    *  - `encodeMjpeg`: JPEG-compressed frames ('00dc' chunks, the 'MJPG'
    *    handler), each frame a full `javax.imageio`-written JPEG — the
    *    real-world compressed path (lossy, so exercised by unit tests
    *    with tolerance, not by the exact oracle). */
  object Avi {
    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    private def header(buf: java.nio.ByteBuffer, w: Int, h: Int,
        microSecPerFrame: Long, nFrames: Int, handler: String,
        compression: Array[Byte], maxFrameBytes: Int): Unit = {
      buf.put(fourcc("LIST")).putInt(4 + 8 + 56 + 12 + 8 + 56 + 8 + 40)
        .put(fourcc("hdrl"))
      buf.put(fourcc("avih")).putInt(56)
        .putInt(microSecPerFrame.toInt).putInt(0).putInt(0).putInt(0)
        .putInt(nFrames).putInt(0).putInt(1).putInt(maxFrameBytes)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      buf.put(fourcc("LIST")).putInt(4 + 8 + 56 + 8 + 40).put(fourcc("strl"))
      buf.put(fourcc("strh")).putInt(56)
        .put(fourcc("vids")).put(fourcc(handler))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(microSecPerFrame.toInt) // dwScale
        .putInt(1000000)                // dwRate → rate/scale = fps
        .putInt(0).putInt(nFrames).putInt(maxFrameBytes).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      buf.put(fourcc("strf")).putInt(40)
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .put(compression, 0, 4).putInt(maxFrameBytes)
        .putInt(0).putInt(0).putInt(0).putInt(0)
    }

    /** Uncompressed-DIB AVI: header size is a closed form the oracle can
      * replay — 12 (RIFF) + 8+4 (hdrl LIST) + 64 (avih) + 12 (strl LIST)
      * + 64 (strh) + 48 (strf) + 12 (movi LIST) + n·(8 + frameBytes),
      * frameBytes = (3w rounded up to 4)·h. */
    def encodeDib(w: Int, h: Int, microSecPerFrame: Long,
        frames: IndexedSeq[(Int, Int) => Int]): Array[Byte] = {
      require(w > 0 && h > 0 && frames.nonEmpty, "empty video")
      // strh rcFrame stores dims as signed shorts
      require(w <= 32767 && h <= 32767, s"frame $w x $h exceeds AVI rcFrame")
      val stride = (w * 3 + 3) / 4 * 4
      val frameBytes = stride * h
      val moviSize = 4 + frames.size * (8 + frameBytes)
      val total = 12 + (8 + 4 + 64 + 12 + 64 + 48) + 8 + moviSize
      val buf = java.nio.ByteBuffer.allocate(total)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(fourcc("RIFF")).putInt(total - 8).put(fourcc("AVI "))
      header(buf, w, h, microSecPerFrame, frames.size, "DIB ",
        Array[Byte](0, 0, 0, 0), frameBytes)
      buf.put(fourcc("LIST")).putInt(moviSize).put(fourcc("movi"))
      frames.foreach { lum =>
        buf.put(fourcc("00db")).putInt(frameBytes)
        var y = h - 1
        while (y >= 0) { // bottom-up rows, BGR
          var x = 0
          while (x < w) {
            val v = (lum(x, y) & 0xff).toByte
            buf.put(v).put(v).put(v)
            x += 1
          }
          var p = w * 3
          while (p < stride) { buf.put(0.toByte); p += 1 }
          y -= 1
        }
      }
      buf.array()
    }

    /** MJPEG AVI: frames are complete JPEGs (chunks padded to even size
      * per RIFF). */
    def encodeMjpeg(w: Int, h: Int, microSecPerFrame: Long,
        frames: IndexedSeq[(Int, Int) => Int]): Array[Byte] = {
      require(w > 0 && h > 0 && frames.nonEmpty, "empty video")
      require(w <= 32767 && h <= 32767, s"frame $w x $h exceeds AVI rcFrame")
      val jpegs = frames.map { lum =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val v = lum(x, y) & 0xff
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      val padded = jpegs.map(j => j.length + (j.length & 1))
      val moviSize = 4 + padded.map(8 + _).sum
      val total = 12 + (8 + 4 + 64 + 12 + 64 + 48) + 8 + moviSize
      val buf = java.nio.ByteBuffer.allocate(total)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(fourcc("RIFF")).putInt(total - 8).put(fourcc("AVI "))
      header(buf, w, h, microSecPerFrame, frames.size, "MJPG",
        fourcc("MJPG"), padded.max)
      buf.put(fourcc("LIST")).putInt(moviSize).put(fourcc("movi"))
      jpegs.foreach { j =>
        buf.put(fourcc("00dc")).putInt(j.length).put(j)
        if ((j.length & 1) == 1) buf.put(0.toByte)
      }
      buf.array()
    }
  }

  /** Real AVI video decode: walks the RIFF chunk tree (hdrl for
    * dimensions and frame timing, movi for frame chunks), decodes
    * '00db' uncompressed-DIB frames with the raster layout from strf
    * (bottom-up padded BGR — exact) and '00dc' compressed frames
    * through `javax.imageio` (MJPEG = per-frame JPEG, a JDK-builtin
    * reader). Anything malformed decodes to None, never a task-killing
    * exception. */
  object RiffVideoCodec extends MediaCodec {
    def features(payload: Array[Byte], dim: Int): Array[Float] =
      decodeVideo(payload) match {
        case None => StubCodec.features(payload, dim)
        case Some(dv) =>
          // per-band mean luminance over `dim` time bands of the clip —
          // the temporal analogue of ImageIoCodec's horizontal bands
          val out = new Array[Float](dim)
          val counts = new Array[Int](dim)
          val n = dv.frames.size
          var f = 0
          while (f < n) {
            val band = math.min(dim - 1, f * dim / math.max(1, n))
            val g = dv.frames(f)
            var s = 0L
            var i = 0
            while (i < g.length) { s += g(i); i += 1 }
            out(band) += (s.toDouble / math.max(1, g.length) / 255.0).toFloat
            counts(band) += 1
            f += 1
          }
          var j = 0
          while (j < dim) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
          out
      }

    override def decodeVideo(payload: Array[Byte]): Option[DecodedVideo] = {
      if (payload == null || payload.length < 24) return None
      val buf = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String =
        new String(payload, off, 4, "US-ASCII")
      try {
        if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
        var width = 0; var height = 0; var uspf = 0L; var bitCount = 0
        var inVideoStream = false
        val frames = IndexedSeq.newBuilder[Array[Int]]
        // walk chunks; LIST bodies recurse (4-byte list type then
        // chunks). Offset bounds are checked in LONG arithmetic: a
        // crafted chunk size near Int.MaxValue must fail the check, not
        // wrap negative past it into a ~2 GB copyOfRange. Recursion
        // depth is capped so nested LISTs cannot stack-overflow a task.
        def walk(start: Int, end: Int, depth: Int): Unit = {
          if (depth > 32) throw new java.io.EOFException("list nesting")
          var off = start
          while (off + 8 <= end) {
            val id = tag(off)
            val size = buf.getInt(off + 4)
            if (size < 0 || off + 8L + size > end)
              throw new java.io.EOFException("chunk bounds")
            if (id == "LIST") {
              walk(off + 12, off + 8 + size, depth + 1)
            } else if (id == "avih") {
              uspf = buf.getInt(off + 8).toLong & 0xffffffffL
            } else if (id == "strh" && size >= 8) {
              // only the 'vids' stream's strf carries raster dimensions;
              // an audio stream's strf (WAVEFORMAT, can be >= 40 bytes)
              // must not clobber them with format-tag/byte-rate garbage
              inVideoStream = tag(off + 8) == "vids"
            } else if (id == "strf" && size >= 40 && inVideoStream) {
              width = buf.getInt(off + 8 + 4)
              height = buf.getInt(off + 8 + 8)
              bitCount = buf.getShort(off + 8 + 14).toInt
            } else if (id.endsWith("db") && width > 0 && height != 0) {
              decodeDibFrame(payload, off + 8, size, width, height, bitCount)
                .foreach(frames += _)
            } else if (id.endsWith("dc")) {
              val slice = java.util.Arrays.copyOfRange(
                payload, off + 8, off + 8 + size)
              ImageIoCodec.decodeImage(slice).foreach { di =>
                if (width == 0) { width = di.width; height = di.height }
                if (di.width == width && di.height == height)
                  frames += di.gray
              }
            }
            off += 8 + size + (size & 1) // chunks pad to even
          }
        }
        walk(12, payload.length, 0)
        val fs = frames.result()
        if (width <= 0 || height == 0 || fs.isEmpty) None
        else Some(DecodedVideo(width, math.abs(height), uspf, fs))
      } catch {
        case _: IndexOutOfBoundsException | _: java.io.EOFException |
            _: StringIndexOutOfBoundsException |
            _: NegativeArraySizeException => None
      }
    }

    /** One uncompressed 24-bit DIB frame: bottom-up (positive height)
      * BGR rows padded to 4 bytes; r==g==b reads exact, else BT.601. */
    private def decodeDibFrame(payload: Array[Byte], off: Int, size: Int,
        w: Int, h: Int, bitCount: Int): Option[Array[Int]] = {
      if (bitCount != 24) return None
      val hh = math.abs(h)
      // LONG arithmetic throughout: crafted strf dims like 65536×32769
      // overflow both stride·hh and w·hh in Int (the size guard would
      // pass and the allocation would throw NegativeArraySizeException);
      // the pixel-count cap also bounds the allocation a hostile header
      // can demand from a tiny payload
      val stride = (w.toLong * 3 + 3) / 4 * 4
      if (w <= 0 || hh <= 0 || w.toLong * hh > (1L << 26) ||
          size.toLong < stride * hh) return None
      val strideI = stride.toInt // ≤ size after the guard above
      val gray = new Array[Int](w * hh)
      var y = 0
      while (y < hh) {
        val srcRow = if (h > 0) hh - 1 - y else y // positive h = bottom-up
        var x = 0
        while (x < w) {
          val p = off + srcRow * strideI + x * 3
          val b = payload(p) & 0xff
          val g = payload(p + 1) & 0xff
          val r = payload(p + 2) & 0xff
          gray(y * w + x) =
            if (r == g && g == b) r else (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        y += 1
      }
      Some(gray)
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
        // sampleRate > 0: javax.sound accepts a fmt chunk declaring
        // rate 0, which would divide-by-zero in duration/RMS math —
        // corrupt header ⇒ None, per the codec contract
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          fmt.getSampleRate > 0
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

  /** Deterministic NEAR-DUPLICATE fixture pixel for perceptual-hash
    * tests: ids come in groups of three (g = id/3) that share one block
    * pattern — 8×8 blocks of a 32×32 image, block b high (220) iff bit
    * (b mod 6) of g+1 is set, low (30) otherwise — plus a per-ID noise
    * term (id·31 + x·7 + y·13) mod 3. Distinct groups with g+1 < 64
    * have distinct 6-bit values, hence distinct block patterns (the
    * pattern tiles those 6 bits), and g+1 ∈ [1, 63) is never all-zeros
    * or all-ones, so every image has ≥ 10 high and ≥ 10 low blocks.
    * The three variants of a group differ in real pixel values
    * (different noise) but never in any block-vs-global mean
    * comparison: per 4×4 block the base-term margin is ≥ 16·1900 while
    * the noise can move a comparison by at most 2048 — so aHash is
    * identical within a group and distinct across groups by
    * construction, and the oracle replays the grouping analytically. */
  def fixtureNearDupPixel(id: Long, x: Int, y: Int): Int = {
    val g = id / 3
    val b = (y / 4) * 8 + (x / 4)
    val base = if ((((g + 1) >> (b % 6)) & 1L) == 1L) 220 else 30
    base + ((id * 31 + x * 7 + y * 13) % 3).toInt
  }

  /** [[fixtureNearDupPixel]] with per-id BLOCK DAMAGE — the regime a
    * hamming-radius perceptual join exists for (re-encodes and small
    * edits change a FEW hash bits; exact aHash grouping misses them).
    * Variant k = id mod 3 of group g inverts one whole 4×4 block
    * (k = 0: none; k = 1, 2: block d_k = (g·5 + k·11) mod 64, d_1 ≠
    * d_2), flipping EXACTLY that block's aHash bit: inversion moves the
    * block mean across the global mean, while the global mean itself
    * moves < 4 gray levels — an order of magnitude under every other
    * block's ≥ 90-level margin, so no other bit flips. Within a triple
    * the 64-bit hashes sit at hamming (0,1) = 1, (0,2) = 1, (1,2) = 2;
    * across groups ≥ 6 (patterns differing in one of the six code bits
    * differ in ~10 blocks, damage adds at most ±4). */
  def fixtureDamagedPixel(id: Long, x: Int, y: Int): Int = {
    val g = id / 3
    val b = (y / 4) * 8 + (x / 4)
    val k = (id % 3).toInt
    val damaged = k != 0 && b == (g * 5 + k * 11) % 64
    val high = ((((g + 1) >> (b % 6)) & 1L) == 1L) != damaged
    val base = if (high) 220 else 30
    base + ((id * 31 + x * 7 + y * 13) % 3).toInt
  }

  /** Media table over [[fixtureDamagedPixel]]: genuine 32×32 BMPs whose
    * consecutive id triples are near-duplicates at aHash hamming ≤ 2
    * but NOT aHash-identical. */
  def syntheticDamagedImageTable(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload =
            Bmp.encodeGray(32, 32, (x, y) => fixtureDamagedPixel(id, x, y))
          Row(id, payload, Row("bmp", 32, 32, null))
        }
      }(enc)
  }

  /** Real-image near-dup media table: one genuine 32×32 BMP per input
    * id, pixels from [[fixtureNearDupPixel]] — consecutive id triples
    * are perceptual near-duplicates of each other. */
  def syntheticNearDupImageTable(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload =
            Bmp.encodeGray(32, 32, (x, y) => fixtureNearDupPixel(id, x, y))
          Row(id, payload, Row("bmp", 32, 32, null))
        }
      }(enc)
  }

  /** Perceptual average-hash (aHash) of each decoded image: divide the
    * raster into `blocks`×`blocks` cells and emit one bit per cell —
    * 1 iff the cell's mean luminance exceeds the image's global mean.
    * The comparison is pure integer cross-multiplication
    * (cell_sum · total_px > total_sum · cell_px), so identical pixels
    * give identical hashes in any engine and small pixel noise (the
    * regime aHash exists for: re-encodes, minor edits) leaves the hash
    * unchanged. Output: (media_id, ahash) with the hash as the
    * `blocks`²-char bit string — the grouping key for perceptual dedup.
    * (Production would pack the 64 bits into a long; the bit-string
    * form is byte-for-byte replayable by a SQL oracle and costs 64
    * bytes/row in the shuffle — not the scale bottleneck, the decode
    * is.) Undecodable payloads are dropped. Cells are the integer
    * lattice x ∈ [bx·w/blocks, (bx+1)·w/blocks) — exact for any
    * dimensions, uniform when blocks divides w and h. */
  def imageAHash(media: DataFrame, codec: MediaCodec = ImageIoCodec,
      blocks: Int = 8): DataFrame = {
    require(blocks > 0, s"blocks $blocks must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          codec.decodeImage(payload).map { di =>
            val nb = blocks
            val sums = new Array[Long](nb * nb)
            val cnts = new Array[Long](nb * nb)
            var y = 0
            while (y < di.height) {
              val by = y * nb / di.height
              var x = 0
              while (x < di.width) {
                val cell = by * nb + x * nb / di.width
                sums(cell) += di.gray(y * di.width + x)
                cnts(cell) += 1
                x += 1
              }
              y += 1
            }
            var total = 0L
            var i = 0
            while (i < sums.length) { total += sums(i); i += 1 }
            val totalPx = di.width.toLong * di.height
            val sb = new java.lang.StringBuilder(nb * nb)
            i = 0
            while (i < sums.length) {
              // cell mean > global mean, integer-exact (empty cells —
              // only when blocks > dimension — compare as 0 > 0: false)
              sb.append(
                if (sums(i) * totalPx > total * cnts(i)) '1' else '0')
              i += 1
            }
            Row(id, sb.toString)
          }
        }
      }(enc)
  }

  /** Deterministic NEAR-DUPLICATE fixture PCM sample for audio
    * fingerprint tests: ids come in groups of three (g = id/3) sharing
    * one 8-frame energy profile — frame f (256 samples) is loud
    * (amplitude 1000) iff bit (f mod 6) of g+1 is set, quiet
    * (amplitude 200) otherwise; the sample alternates sign and carries
    * per-ID noise (id·31 + i·17) mod 3 − 1. Frame energies differ
    * between loud and quiet by ≥ 1.8·10⁸ per frame-vs-mean comparison
    * while noise moves one by ≤ ~5·10⁵, so the energy-profile
    * fingerprint is identical within a group and (for g+1 ∈ [1, 63))
    * distinct across groups — replayable analytically. */
  def fixtureNearDupSample(id: Long, i: Int): Int = {
    val g = id / 3
    val f = i / 256
    val amp = if ((((g + 1) >> (f % 6)) & 1L) == 1L) 1000 else 200
    val sign = 1 - 2 * (i % 2)
    amp * sign + ((id * 31 + i.toLong * 17) % 3).toInt - 1
  }

  /** Real-audio near-dup media table: one genuine 8 kHz mono PCM16 WAV
    * of 2048 samples per input id, samples from [[fixtureNearDupSample]]
    * — consecutive id triples share an energy profile. */
  def syntheticNearDupAudioTable(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val samples = Array.tabulate(2048)(i =>
            fixtureNearDupSample(id, i).toShort)
          Row(id, Wav.encodePcm16(8000, samples),
            Row("wav", null, null, 2048L * 1000L / 8000L))
        }
      }(enc)
  }

  /** Energy-profile audio fingerprint of each decoded clip: split the
    * samples into fixed `frameSamples`-sample frames and emit one bit
    * per frame — 1 iff the frame's energy (sum of squared samples)
    * exceeds the clip's mean frame energy. The comparison is integer
    * cross-multiplication (frame_energy · n_frames > total_energy), so
    * identical samples give identical fingerprints in any engine, and
    * small sample noise (re-encodes, dither) leaves the fingerprint
    * unchanged — the audio analogue of [[imageAHash]], a deliberately
    * simple stand-in for spectral fingerprints (those need FFT; the
    * grouping/shuffle shape downstream is identical). A trailing
    * partial frame is dropped. Output: (media_id, afp) bit string;
    * undecodable payloads are dropped. */
  def audioFingerprint(media: DataFrame,
      codec: MediaCodec = JavaSoundCodec,
      frameSamples: Int = 256): DataFrame = {
    require(frameSamples > 0, s"frameSamples $frameSamples must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("afp", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          codec.decodeAudio(payload).map { da =>
            val nf = da.samples.length / frameSamples
            val e = new Array[Long](nf)
            var f = 0
            while (f < nf) {
              var s = 0L
              var i = f * frameSamples
              val end = i + frameSamples
              while (i < end) {
                val v = da.samples(i).toLong
                s += v * v
                i += 1
              }
              e(f) = s
              f += 1
            }
            var total = 0L
            f = 0
            while (f < nf) { total += e(f); f += 1 }
            val sb = new java.lang.StringBuilder(nf)
            f = 0
            while (f < nf) {
              sb.append(if (e(f) * nf > total) '1' else '0')
              f += 1
            }
            Row(id, sb.toString)
          }
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

  /** Deterministic per-frame fixture pixel:
    * (id·31 + f·41 + x·7 + y·13) mod 256 — pure integer arithmetic an
    * oracle can replay analytically; frame f shifts the pattern so
    * frame-sampling results are frame-distinct. */
  def fixtureVideoPixel(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 41 + x * 7 + y * 13) % 256).toInt

  /** Deterministic near-dup VIDEO fixture pixel: consecutive id-triples
    * (grp = id/3) share frame content; variant k = id%3 is k=0 the
    * original, k=1 the same pixels (the entry trims its frame count
    * instead — the re-encode-and-cut duplicate class), k=2 the original
    * with ONE 4×4 aHash cell per frame inverted (a logo/watermark-style
    * local edit — flips exactly that cell's hash bit). Each cell is a
    * flat 20 or 180 from the CUBIC bit ((s³ + 7s) mod 1021) & 1 with
    * s = (grp·4 + f)·64 + cell. Linear and quadratic per-cell rules
    * alias: two (grp, f) pairs whose s-sequences differ by a constant
    * (or coincide mod the modulus) produce identical cell sets —
    * measured on earlier candidates: a gradient fixture "matched" 46%
    * of all video pairs, a 6-bucket bit-sample collided (g, f) with
    * (g+7, f−1), and a quadratic collided (g, f) with (g+8, f−1) via
    * 64·8 ≡ −2551 (mod 1021). The cubic was verified exhaustively: all
    * 160 (grp, f) patterns here sit ≥ 17 bits apart (bright-cell
    * counts 26–38, so the mean rule never degenerates) while planted
    * variants sit at hamming 0 (trim) or 1 (edit) — both far from the
    * radius-6 vote. */
  def fixtureNearDupVideoPixel(id: Long, f: Int, x: Int, y: Int): Int = {
    val grp = id / 3
    val cell = (y / 4) * 8 + (x / 4)
    val s = (grp * 4 + f) * 64L + cell
    val base = if (((s * s * s + 7 * s) % 1021 & 1) == 1) 180 else 20
    if (id % 3 == 2 && cell == ((grp + f) % 64).toInt) 200 - base
    else base
  }

  /** Real-video near-dup media table: one genuine 32×32 AVI per input
    * id, 10 fps, 4 frames (3 for the k=1 trimmed variant), pixels from
    * [[fixtureNearDupVideoPixel]] — consecutive id triples are
    * perceptual near-duplicates with planted trim/edit variants (the
    * video analogue of [[syntheticNearDupImageTable]]). */
  def syntheticNearDupVideoTable(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val n = if (id % 3 == 1) 3 else 4
          val payload = Avi.encodeDib(32, 32, 100000L,
            IndexedSeq.tabulate(n)(f =>
              (x: Int, y: Int) => fixtureNearDupVideoPixel(id, f, x, y)))
          Row(id, payload, Row("avi", 32, 32, n * 100L))
        }
      }(enc)
  }

  /** Per-FRAME perceptual average-hash over REAL decoded video frames:
    * the [[imageAHash]] bit rule (cell mean > frame mean, integer
    * cross-multiplication — engine-exact) applied to every decoded
    * frame. Output: (media_id, frame_idx, ahash bit-string). Decode is
    * map-side; payload bytes never shuffle — only (id, idx, 64-char
    * hash) rows flow on, which downstream packs to one long. */
  def videoFrameAHash(media: DataFrame,
      codec: MediaCodec = RiffVideoCodec, blocks: Int = 8): DataFrame = {
    require(blocks > 0, s"blocks $blocks must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("ahash", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          codec.decodeVideo(payload) match {
            case None => Iterator.empty
            case Some(dv) =>
              val nb = blocks
              dv.frames.iterator.zipWithIndex.map { case (g, idx) =>
                val sums = new Array[Long](nb * nb)
                val cnts = new Array[Long](nb * nb)
                var y = 0
                while (y < dv.height) {
                  val by = y * nb / dv.height
                  var x = 0
                  while (x < dv.width) {
                    val cell = by * nb + x * nb / dv.width
                    sums(cell) += g(y * dv.width + x)
                    cnts(cell) += 1
                    x += 1
                  }
                  y += 1
                }
                var total = 0L
                var i = 0
                while (i < sums.length) { total += sums(i); i += 1 }
                val totalPx = dv.width.toLong * dv.height
                val sb = new java.lang.StringBuilder(nb * nb)
                i = 0
                while (i < sums.length) {
                  sb.append(
                    if (sums(i) * totalPx > total * cnts(i)) '1' else '0')
                  i += 1
                }
                Row(id, idx, sb.toString)
              }
          }
        }
      }(enc)
  }

  /** Density-scaled frame-hash parameters for a banded hamming
    * near-dup join over [[videoFrameAHash]] signatures — the
    * [[Dedup.autoSrpParams]] precedent applied to perceptual hashes,
    * where BLOCK RESOLUTION is the width lever (an n-block grid yields
    * an n²-bit hash). Returns (blocks, width).
    *
    * Why the default must scale: banding a 64-bit hash into
    * `maxHamming+1 = 7` chunks keys buckets on 9-bit values — 512
    * realizable buckets per band — so past a few hundred frames the
    * per-band buckets MUST grow linearly and the skew cap truncates
    * structurally (tools.MediaSoak measured 8.7M cap-dropped rows at
    * sf10 under the 64-bit shape, while the 256-bit/36-bit-chunk shape
    * held exact planted recall with zero drops). Rule: the smallest
    * rung in {8 blocks → 64 bits, 16 blocks → 256 bits} whose
    * per-chunk key space `2^(width/(maxHamming+1))` covers 4× the
    * frame count — the same 4× coverage margin as autoSrpParams. The
    * 16-block rung's 36-bit chunks cover ~17 G frames, past any real
    * corpus, so the ladder stops there (a 32-block/1024-bit rung would
    * pay 4× the signature bytes for key space nothing needs).
    *
    * Semantics note (deliberate, documented): the radius is
    * interpreted at the CHOSEN resolution, so the wide rung's
    * `hamming ≤ maxHamming` over 4× the bits is a strictly tighter
    * predicate (~maxHamming/4 of the coarse blocks edited). That is
    * the contract that survives scale — at the densities that force
    * the wide rung, the coarse radius-6-of-64 predicate is exactly
    * what floods the candidate stream — and the planted damage classes
    * (trims, single-block edits) sit inside both. Scaling the radius
    * with width instead (the SRP rule) would band into
    * `4·maxHamming+1` chunks of ~10 bits and re-saturate; perceptual
    * hashes fight bucket saturation with RESOLUTION, not radius. */
  def autoFrameHashParams(nFrames: Long, maxHamming: Int = 6)
      : (Int, Int) = {
    require(nFrames >= 0 && maxHamming >= 0,
      s"bad autoFrameHashParams($nFrames, $maxHamming)")
    val small = {
      val chunkBits = 64 / (maxHamming + 1)
      chunkBits <= 62 && (1L << chunkBits) >= 4L * nFrames
    }
    if (small) (8, 64) else (16, 256)
  }

  /** [[videoFrameAHash]]'s bits packed to the array<long> signature
    * layout [[Dedup.hammingNearDuplicatesWide]] consumes (word w =
    * bits [64w, 64w+64), bit i of word w ← cell 64w+i's bit): output
    * (media_id, frame_idx, sig). Packs IN the decode pass — the
    * bit-string + SQL-fold spelling costs a ~64·words-step
    * higher-order expression per row re-analyzed per query (the s23
    * driver-cost lesson) where this is a bitwise OR in the same loop
    * that computes the cell means. Works for any blocks whose square
    * is a multiple of 64 — both rungs of [[autoFrameHashParams]];
    * WideHammingSpec pins bit equality against the string spelling. */
  def videoFrameAHashPacked(media: DataFrame, blocks: Int,
      codec: MediaCodec = RiffVideoCodec): DataFrame = {
    val width = blocks * blocks
    require(width % 64 == 0,
      s"blocks $blocks gives a ${width}-bit hash, not packable to longs")
    val words = width / 64
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("sig", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          codec.decodeVideo(payload) match {
            case None => Iterator.empty
            case Some(dv) =>
              val nb = blocks
              dv.frames.iterator.zipWithIndex.map { case (g, idx) =>
                val sums = new Array[Long](nb * nb)
                val cnts = new Array[Long](nb * nb)
                var y = 0
                while (y < dv.height) {
                  val by = y * nb / dv.height
                  var x = 0
                  while (x < dv.width) {
                    val cell = by * nb + x * nb / dv.width
                    sums(cell) += g(y * dv.width + x)
                    cnts(cell) += 1
                    x += 1
                  }
                  y += 1
                }
                var total = 0L
                var i = 0
                while (i < sums.length) { total += sums(i); i += 1 }
                val totalPx = dv.width.toLong * dv.height
                val sig = new Array[Long](words)
                i = 0
                while (i < sums.length) {
                  if (sums(i) * totalPx > total * cnts(i))
                    sig(i >> 6) |= 1L << (i & 63)
                  i += 1
                }
                Row(id, idx, sig.toSeq)
              }
          }
        }
      }(enc)
  }

  /** Real-video media table: one genuine AVI (uncompressed-DIB frames)
    * per input id — dimensions 8+id%13 × 8+(id·3)%11, 3+id%4 frames at
    * 10+(id%3)·5 fps, pixels from [[fixtureVideoPixel]]. The payloads
    * are decodable RIFF/AVI containers, so the container-parse →
    * frame-decode → stats path downstream is the real one end-to-end
    * (the video analogue of [[syntheticImageTable]]). */
  def syntheticVideoTable(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = 8 + (id % 13).toInt
          val h = 8 + ((id * 3) % 11).toInt
          val n = 3 + (id % 4).toInt
          val fps = 10 + (id % 3).toInt * 5
          val uspf = 1000000L / fps
          val payload = Avi.encodeDib(w, h, uspf,
            IndexedSeq.tabulate(n)(f =>
              (x: Int, y: Int) => fixtureVideoPixel(id, f, x, y)))
          Row(id, payload, Row("avi", w, h, n * uspf / 1000L))
        }
      }(enc)
  }

  /** Decode each payload and derive per-clip video statistics:
    * (media_id, width, height, n_frames, duration_ms, mean_lum,
    * n_bytes) — undecodable payloads keep their byte count with null
    * video columns. Batched per partition; payload bytes never shuffle —
    * only scalars flow downstream. */
  def decodeVideos(media: DataFrame,
      codec: MediaCodec = RiffVideoCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("duration_ms", LongType),
      StructField("mean_lum", DoubleType),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val nBytes = if (payload == null) 0L else payload.length.toLong
          codec.decodeVideo(payload) match {
            case Some(dv) if dv.frames.nonEmpty =>
              var s = 0L
              var px = 0L
              dv.frames.foreach { g =>
                var i = 0
                while (i < g.length) { s += g(i); i += 1 }
                px += g.length
              }
              Row(id, dv.width, dv.height, dv.frames.size,
                dv.frames.size * dv.microSecPerFrame / 1000L,
                s.toDouble / px, nBytes)
            case _ => Row(id, null, null, null, null, null, nBytes)
          }
        }
      }(enc)
  }

  /** Video frame sampling over REAL decoded frames: every `everyN`-th
    * frame (capped), each with its container timestamp and decoded mean
    * luminance. Payload bytes never fan out — only
    * (id, frame_idx, frame_ts_ms, frame_mean_lum) rows flow on; the
    * metadata-only [[sampleFrames]] remains the cheap no-decode twin. */
  def sampleVideoFrames(media: DataFrame, everyN: Int, maxFrames: Int = 32,
      codec: MediaCodec = RiffVideoCodec): DataFrame = {
    require(everyN > 0, "everyN must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_ts_ms", LongType, nullable = false),
      StructField("frame_mean_lum", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          codec.decodeVideo(payload) match {
            case None => Iterator.empty
            case Some(dv) =>
              val n = dv.frames.size
              Iterator.tabulate(
                  math.min(maxFrames, (n + everyN - 1) / everyN)) { idx =>
                val f = idx * everyN
                val g = dv.frames(f)
                var s = 0L
                var i = 0
                while (i < g.length) { s += g(i); i += 1 }
                Row(id, idx, f * dv.microSecPerFrame / 1000L,
                  s.toDouble / g.length)
              }
          }
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

  /** Decode + nearest-neighbor resize to a fixed `outW`×`outH` thumbnail
    * — the normalization step every vision-training pipeline runs before
    * batching (a model wants one tensor shape; storage has every shape).
    * Source pixel for thumb (x,y) is (x·w div outW, y·h div outH): pure
    * integer index arithmetic over the REAL decoded raster, so the
    * resample is exactly replayable by the analytic oracle (bilinear
    * would be the quality upgrade; NN is the deterministic baseline and
    * the plumbing — decode, resample loop, per-image output shape — is
    * identical). Emits the thumbnail bytes plus integer pin-down
    * aggregates: `thumb_sum` and a position-weighted `thumb_chk`
    * (Σ v(x,y)·(y·outW+x+1)) that a wrong sampling index, row order, or
    * channel read cannot preserve. Payload bytes never shuffle; the
    * thumbnail is outW·outH bytes/row — the column a 100 TB pipeline
    * would persist. Undecodable payloads yield null thumbnails. */
  def resizeImages(media: DataFrame, outW: Int, outH: Int,
      codec: MediaCodec = ImageIoCodec): DataFrame = {
    require(outW >= 1 && outH >= 1 && outW * outH <= (1 << 20),
      s"bad thumbnail shape ${outW}x$outH")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("src_w", IntegerType),
      StructField("src_h", IntegerType),
      StructField("thumb", BinaryType),
      StructField("thumb_sum", LongType),
      StructField("thumb_chk", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          codec.decodeImage(payload) match {
            case Some(di) =>
              val t = new Array[Byte](outW * outH)
              var sum = 0L
              var chk = 0L
              var y = 0
              while (y < outH) {
                val sy = y * di.height / outH
                var x = 0
                while (x < outW) {
                  val sx = x * di.width / outW
                  val v = di.gray(sy * di.width + sx)
                  t(y * outW + x) = v.toByte
                  sum += v
                  chk += v.toLong * (y * outW + x + 1)
                  x += 1
                }
                y += 1
              }
              Row(id, di.width, di.height, t, sum, chk)
            case None => Row(id, null, null, null, null, null)
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

  /** Per-image luminance histogram over REAL decoded pixels: count of
    * pixels per equal-width bucket (256/buckets levels each) — the
    * exposure/contrast profile image curation filters threshold on
    * (all-black scans, blown-out pages). One decode + one counting
    * loop per image; only (media_id, bucket, n) long rows flow
    * downstream. Undecodable payloads emit nothing. */
  def lumHistogram(media: DataFrame, buckets: Int = 8,
      codec: MediaCodec = ImageIoCodec): DataFrame = {
    require(buckets >= 1 && 256 % buckets == 0,
      s"buckets ($buckets) must divide 256")
    val width = 256 / buckets
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bucket", LongType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          codec.decodeImage(r.getAs[Array[Byte]](1)) match {
            case Some(di) =>
              val counts = new Array[Long](buckets)
              var i = 0
              while (i < di.gray.length) {
                counts(di.gray(i) / width) += 1L
                i += 1
              }
              (0 until buckets).iterator
                .filter(b => counts(b) > 0L)
                .map(b => Row(id, b.toLong, counts(b)))
            case None => Iterator.empty
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
      .when(substring(payload, 1, 4) === lit(riffMagic) &&
        substring(payload, 9, 4) === lit("AVI ".getBytes("US-ASCII")), "avi")
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
