package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side contract is real — schemas, per-partition batched
  * execution, deterministic output — while the actual codecs are STUBBED
  * (this container has no image/audio libraries): `decodeStub` derives
  * deterministic pseudo-features from the bytes. Swap `MediaCodec` for a
  * real implementation (JNI/javacpp ffmpeg etc.) without touching the
  * plumbing.
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

  /** The codec seam. Deterministic stub: "decodes" a payload into a
    * fixed-length feature vector derived from byte statistics. A real
    * implementation would decode pixels/samples here. */
  trait MediaCodec extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Float]
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
    * metadata synthesized deterministically from the content. */
  def syntheticMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fmt = element_at(array(lit("jpeg"), lit("png"), lit("wav")),
      (pmod(xxhash64(col(textCol)), lit(3)) + 1).cast("int"))
    val header = when(fmt === "jpeg", lit(jpegMagic))
      .when(fmt === "png", lit(pngMagic))
      // RIFF<size little-endian, unknown here: zeros>WAVE
      .otherwise(lit(riffMagic ++ Array[Byte](0, 0, 0, 0) ++ waveTag))
    df.select(
      col(idCol).cast("long").as("media_id"),
      concat(header, encode(col(textCol), "utf-8")).as("payload"),
      struct(
        fmt.as("format"),
        (pmod(xxhash64(col(textCol)), lit(1024)) + 32).cast("int").as("width"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(1024)) + 32).cast("int").as("height"),
        pmod(xxhash64(col(textCol), lit(2)), lit(600000)).as("duration_ms")
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
