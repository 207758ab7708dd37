package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * as a partition-local batch transform (`mapPartitions` over an
  * iterator — the Scala analog of an arrow-batched Python UDF).
  *
  * The actual media decoding is STUBBED — no image/audio libraries ship
  * in this container. Everything around the stub is real and tested
  * (MultimodalSuite): the schema contract, the partition-batched
  * execution shape, and the deterministic fallback featureizer.
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

  /** REAL DECODER HOOK — wire a media library here when one is available
    * (e.g. javax.imageio / ffmpeg bindings). Intentionally unimplemented
    * in this offline build. */
  def decodeReal(payload: Array[Byte], mime: String): (Int, Int) = ???

  /** Deterministic fallback "decode": dimensions derived arithmetically
    * from the byte length — preserves the exact execution shape (schema,
    * nullability, per-partition batching) without media libs. */
  def decodeFake(payload: Array[Byte]): (Int, Int) =
    (1 + payload.length % 64, 1 + (payload.length * 7) % 64)

  /** Decode + featurize, partition-batched. `useRealDecoder = false`
    * keeps the deterministic fake (the only option offline). */
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
            if (useRealDecoder) decodeReal(payload, mime) else decodeFake(payload)
          val mean =
            if (payload.isEmpty) 0.0
            else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / payload.length
          Row(id, payload, mime, payload.length.toLong, w, h, mean)
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
