package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * as a partition-local batch transform (`mapPartitions` over an
  * iterator — the Scala analog of an arrow-batched Python UDF).
  *
  * Header-level media decoding (PNG/BMP/WAV) is real, pure-JVM byte
  * parsing — see [[decodeReal]]; pixel/sample decoding would need media
  * libraries that don't ship in this container, so the deterministic
  * [[decodeFake]] featureizer stands in for opaque formats. The schema
  * contract, partition-batched execution shape, and both decode paths
  * are tested in FunctionsSuite.
  *
  * Scale notes: payload bytes never pass through a shuffle — decode is a
  * narrow transformation; keep media tables partitioned by content id and
  * size `spark.sql.files.maxPartitionBytes` so one task holds a bounded
  * number of payloads in memory.
  */
object Multimodal {

  /** Schema contract for a media table. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true)))

  /** Extracted features appended by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(mediaSchema.fields ++ Seq(
    StructField("byte_len", LongType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("byte_mean", DoubleType, nullable = true)))

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Real header decode for self-describing formats, pure JVM — no media
    * libraries needed. Dispatches on magic bytes, not the (untrusted)
    * mime string:
    *  - PNG: IHDR width/height (big-endian ints at offsets 16/20 — the
    *    IHDR chunk is required to be first by the PNG spec)
    *  - BMP: BITMAPINFOHEADER width/height (little-endian at 18/22)
    *  - WAV: (sample rate, channels) from the fmt chunk (RIFF/WAVE with
    *    "fmt " as the first chunk at offset 12)
    * Unknown or truncated payloads throw IllegalArgumentException — the
    * caller decides whether to fall back to [[decodeFake]]. */
  def decodeReal(payload: Array[Byte], mime: String): (Int, Int) = {
    def starts(sig: Array[Byte], off: Int = 0): Boolean =
      payload.length >= off + sig.length &&
        sig.indices.forall(i => payload(off + i) == sig(i))
    if (starts(PngSig) && payload.length >= 24 &&
        starts("IHDR".getBytes("US-ASCII"), 12))
      (beInt(payload, 16), beInt(payload, 20))
    else if (starts("BM".getBytes("US-ASCII")) && payload.length >= 26 &&
        // accept only DIB headers that place width/height at 18/22
        // (BITMAPINFOHEADER and the V4/V5 extensions) — an OS/2
        // BITMAPCOREHEADER stores 16-bit dims at 18/20 and would parse
        // as garbage; height is negative for top-down rows
        Set(40, 52, 56, 108, 124).contains(leInt(payload, 14)))
      (leInt(payload, 18), math.abs(leInt(payload, 22)))
    else if (starts("RIFF".getBytes("US-ASCII")) && payload.length >= 28 &&
        starts("WAVE".getBytes("US-ASCII"), 8) &&
        starts("fmt ".getBytes("US-ASCII"), 12))
      (leInt(payload, 24), leShort(payload, 22))
    else throw new IllegalArgumentException(
      s"unrecognized media payload (${payload.length} bytes; " +
        s"mime hint: $mime) — supported: PNG, BMP, WAV")
  }

  /** Deterministic fallback "decode": dimensions derived arithmetically
    * from the byte length — preserves the exact execution shape (schema,
    * nullability, per-partition batching) without media libs. */
  def decodeFake(payload: Array[Byte]): (Int, Int) =
    // long arithmetic: length*7 wraps Int negative past ~306 MB — a
    // payload size squarely in scope for video blobs — and a negative
    // Scala % then emitted nonpositive heights that drove resize scales
    // negative (r15 review). The oracle's SQL mirror is BIGINT math, so
    // this also aligns the two engines at large payloads.
    (1 + (payload.length.toLong % 64L).toInt,
      1 + (payload.length.toLong * 7L % 64L).toInt)

  /** Decode + featurize, partition-batched. `useRealDecoder = true`
    * parses real PNG/BMP/WAV headers ([[decodeReal]]); `false` keeps the
    * deterministic fake for opaque payloads (e.g. the text stand-ins the
    * offline test tables provide). */
  def decodeFeatures(media: DataFrame, useRealDecoder: Boolean = false): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "payload", "mime").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val mime = if (r.isNullAt(2)) null else r.getString(2)
        if (payload == null) Row(id, null, mime, null, null, null, null)
        else {
          val (w, h) =
            if (useRealDecoder)
              // unrecognized/truncated payloads degrade to the
              // deterministic fake instead of failing the task — one bad
              // payload must not abort a 100 TB decode job
              try decodeReal(payload, mime)
              catch { case _: IllegalArgumentException => decodeFake(payload) }
            else decodeFake(payload)
          val mean =
            if (payload.isEmpty) 0.0
            else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / payload.length
          Row(id, payload, mime, payload.length.toLong, w, h, mean)
        }
      }
    }(enc)
  }

  /** Schema appended by [[resizeFeatures]]. */
  val resizeSchema: StructType = StructType(featureSchema.fields ++ Seq(
    StructField("out_width", IntegerType, nullable = true),
    StructField("out_height", IntegerType, nullable = true),
    StructField("thumb", BinaryType, nullable = true)))

  /** Resize transform over decoded features: computes aspect-preserving
    * output dimensions (fit inside maxW×maxH, never upscale) and emits a
    * deterministic byte-subsampled thumbnail payload. The dimension math
    * and the partition-batched execution shape are the real operator; a
    * pixel-accurate scaler would replace ONLY the byte-subsampling step
    * when an image library exists. Narrow transform — payloads never
    * shuffle. */
  def resizeFeatures(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(resizeSchema)
    features.mapPartitions { rows =>
      rows.map { r =>
        val base = Row.fromSeq(r.toSeq)
        if (r.isNullAt(1)) Row.fromSeq(base.toSeq ++ Seq(null, null, null))
        else {
          val payload = r.getAs[Array[Byte]](1)
          // positional access — mapPartitions rows carry no schema
          val w = r.getInt(4); val h = r.getInt(5)
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          val (ow, oh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          // deterministic thumbnail: every k-th byte so thumb size tracks
          // the area ratio — stands in for the pixel scaler offline
          val k = math.max(1, (payload.length.toLong * ow * oh / math.max(1L, w.toLong * h)).toInt)
          val stride = math.max(1, payload.length / math.max(1, k))
          val thumb = payload.indices.by(stride).map(payload).toArray
          Row.fromSeq(base.toSeq ++ Seq(ow, oh, thumb))
        }
      }
    }(enc)
  }

  /** Frame sampling for a video-like payload: treat the payload as
    * `frameCount` equal byte chunks and emit every `every`-th chunk as
    * (media_id, frame_idx, frame_bytes) rows — the explode shape a real
    * container demuxer would feed. One input row → ≤ frameCount/every
    * output rows; still a narrow transform. */
  def sampleFrames(media: DataFrame, frameCount: Int, every: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.isNullAt(1)) Iterator.empty
        else {
          val payload = r.getAs[Array[Byte]](1)
          val id = r.getLong(0)
          val chunk = math.max(1, payload.length / math.max(1, frameCount))
          (0 until frameCount by every).iterator
            .map { i =>
              val from = i * chunk
              // the LAST frame absorbs the floor-division remainder so
              // the sampled frames jointly cover every payload byte —
              // chunk = len/frameCount floors, and up to frameCount-1
              // tail bytes previously appeared in no frame (r15 review)
              val until =
                if (i == frameCount - 1) payload.length
                else math.min(payload.length, from + chunk)
              Row(id, i, if (from >= payload.length) Array.emptyByteArray
                else java.util.Arrays.copyOfRange(payload, from, until))
            }
        }
      }
    }(enc)
  }

  /** Build a media DataFrame from the documents table (text bytes stand in
    * for payloads offline). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("mime"))
}
