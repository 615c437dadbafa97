package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape, metadata extraction — while the media codecs themselves are
  * STUBBED (this container ships no image/audio libraries): `decodeStub`
  * produces a deterministic fake decode so the pipeline shape can be
  * exercised end-to-end. On a real cluster you swap `decodeStub` for a JNI /
  * process-isolated decoder inside the same mapPartitions loop; nothing else
  * changes.
  */
object Multimodal {

  /** One decoded-media row: the typed metadata a decode stage yields. */
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                       digest: String, width: Int, height: Int,
                       frames: Int)

  /** Wrap a text table as a binary media table: payload = utf-8 bytes.
    * Stands in for reading image/audio blobs from parquet binary columns. */
  def asBinaryPayload(docs: DataFrame, id: Column, payloadSource: Column,
                      mediaType: Column): DataFrame =
    docs.select(id.as("doc_id"),
      payloadSource.cast("binary").as("payload"),
      mediaType.as("media_type"))

  /** STUB decoder — deterministic fake: derives width/height/frames from
    * payload length and first bytes. Replace with a real codec at the same
    * call site; the batch shape (one partition = one decoder instance,
    * records streamed through it) is the production pattern. */
  def decodeStub(payload: Array[Byte], mediaType: String): (Int, Int, Int) = {
    val n = payload.length
    val w = 16 + (n % 64)
    val h = 16 + ((n / 64) % 64)
    val frames = mediaType match {
      case "video" => 1 + (n % 30)
      case "audio" => 1 + (n % 1000)
      case _       => 1
    }
    (w, h, frames)
  }

  /** Decode + feature-extract over binary payloads. mapPartitions keeps one
    * (stub) decoder per partition — the Scala analog of mapInPandas batches:
    * amortized per-partition setup, rows streamed, no per-row codec init. */
  def extractMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    implicit val enc = Encoders.product[MediaMeta]
    media.select(col("doc_id").cast("long"), col("payload"),
        col("media_type").cast("string"))
      .mapPartitions { rows =>
        // per-partition decoder setup happens here (stubbed)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val (w, h, f) = decodeStub(payload, mt)
          md.reset()
          val digest = md.digest(payload).map("%02x".format(_)).mkString
          MediaMeta(id, mt, payload.length.toLong, digest, w, h, f)
        }
      }
  }

  /** STUB feature extractor: a deterministic `dim`-dimensional embedding
    * derived from the payload digest (feature i = 32 bits of
    * md5(digest ++ ":" ++ i) as a uniform in [0,1)). Replace with a real
    * vision/audio encoder at the same call site — downstream (similarity
    * search, embedding dedup) consumes only the (doc_id, embedding) shape.
    * Pure column algebra: per-row codegen, no shuffle, and exactly
    * reproducible outside the engine (the oracle recomputes it in SQL). */
  def featureStub(media: DataFrame, dim: Int): DataFrame = {
    require(dim > 0)
    val digest = md5(col("payload"))
    val feats = (0 until dim).map { i =>
      (conv(substring(md5(concat(digest, lit(s":$i"))), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0)).cast("float")
    }
    media.select(col("doc_id"), array(feats: _*).as("embedding"))
  }

  /** Resize plan for image-typed payloads: scale to fit inside
    * (maxW, maxH) preserving aspect ratio (integer math, no decode —
    * the real pixel work happens in the decoder stub's slot). */
  def resizePlan(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scaleNum = least(lit(maxW) * col("height"), lit(maxH) * col("width"))
    val scaleDen = col("width") * col("height")
    meta.filter(col("media_type") === "image")
      .withColumn("out_w",
        greatest(lit(1), floor(col("width") * scaleNum / scaleDen).cast("int")))
      .withColumn("out_h",
        greatest(lit(1), floor(col("height") * scaleNum / scaleDen).cast("int")))
      .select(col("doc_id"), col("width"), col("height"),
        col("out_w"), col("out_h"))
  }

  /** Frame sampling for video-typed payloads: every `stride`-th frame index.
    * Pure column algebra — stays in codegen. */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.filter(col("media_type") === "video")
      .select(col("doc_id"), col("frames"),
        sequence(lit(0), col("frames") - 1, lit(stride)).as("sampled_idx"))
      .withColumn("n_sampled", size(col("sampled_idx")))
}
