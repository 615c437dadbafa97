package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape, metadata extraction. IMAGE headers are decoded for REAL:
  * [[parseImageMeta]] reads PNG / JPEG / GIF dimensions straight from the
  * container bytes per the public specs (PNG IHDR, RFC 2083 §11.2.2; JPEG
  * SOFn marker scan, ITU-T T.81 §B.2.2; GIF logical screen descriptor,
  * GIF89a spec §18) — pure JVM byte arithmetic, no codec library. Pixel
  * decode and audio/video codecs remain STUBBED (this container ships no
  * media libraries): `decodeStub` produces a deterministic fake so the
  * pipeline shape is exercised end-to-end; on a real cluster you swap it
  * for a JNI / process-isolated decoder inside the same mapPartitions
  * loop; nothing else changes.
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

  // ------------------------------------------------------------ real codecs

  /** Synthesize REAL container bytes: a spec-conforming PNG / JPEG / GIF
    * header carrying (w, h), followed by `body` as the (opaque) payload.
    * The headers are genuine — byte-identical to what an encoder writes
    * for these dimensions (PNG includes the true CRC-32 of its IHDR
    * chunk; JPEG is SOI + APP0/JFIF + baseline SOF0; GIF is the GIF89a
    * logical screen descriptor) — so any independent header reader
    * (javax.imageio included, MultimodalSpec cross-checks) extracts the
    * same dimensions. The body is NOT valid pixel data; header metadata
    * is exactly what a 100 TB ingest pass extracts without decoding. */
  def synthesizeImage(format: String, w: Int, h: Int,
                      body: Array[Byte]): Array[Byte] = {
    require(w >= 1 && w <= 0xFFFF && h >= 1 && h <= 0xFFFF,
      s"dims must fit u16 for all three containers, got ${w}x$h")
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val bos = new java.io.ByteArrayOutputStream(64 + body.length)
    format match {
      case "png" =>
        bos.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
          .map(_.toByte))
        bos.write(be32(13L)) // IHDR data length
        val ihdr = new java.io.ByteArrayOutputStream(17)
        ihdr.write("IHDR".getBytes("US-ASCII"))
        ihdr.write(be32(w.toLong)); ihdr.write(be32(h.toLong))
        // bit depth 8, truecolor, deflate, filter 0, no interlace
        ihdr.write(Array[Byte](8, 2, 0, 0, 0))
        val chunk = ihdr.toByteArray
        bos.write(chunk)
        val crc = new java.util.zip.CRC32()
        crc.update(chunk)
        bos.write(be32(crc.getValue))
      case "jpeg" =>
        bos.write(Array(0xFF, 0xD8).map(_.toByte)) // SOI
        bos.write(Array(0xFF, 0xE0, 0x00, 0x10).map(_.toByte)) // APP0 len 16
        bos.write("JFIF".getBytes("US-ASCII"))
        bos.write(Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
        bos.write(Array(0xFF, 0xC0, 0x00, 0x11, 0x08).map(_.toByte)) // SOF0
        bos.write(be16(h)); bos.write(be16(w))
        bos.write(Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
        // SOS start-of-scan (3 components) so the stream is structurally
        // complete up to the entropy data — the JDK's native JPEG header
        // reader refuses streams that never reach a scan
        bos.write(Array(0xFF, 0xDA, 0x00, 0x0C).map(_.toByte))
        bos.write(Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0x3F, 0))
      case "gif" =>
        bos.write("GIF89a".getBytes("US-ASCII"))
        bos.write(le16(w)); bos.write(le16(h))
        bos.write(Array(0xF7, 0x00, 0x00).map(_.toByte))
      case other =>
        throw new IllegalArgumentException(s"unknown image format: $other")
    }
    bos.write(body)
    bos.toByteArray
  }

  /** Header byte overhead [[synthesizeImage]] adds per format — pinned so
    * oracles can reconstruct n_bytes from the body length. */
  val headerBytes: Map[String, Int] = Map("png" -> 33, "jpeg" -> 53,
    "gif" -> 13)

  /** REAL image-header decode: (format, width, height) parsed from the
    * first bytes per the public container specs, or None when the payload
    * is not a recognizable PNG / JPEG / GIF. JPEG requires a marker-
    * segment scan (APPn/COM/DQT/DHT lengths are skipped until a SOFn frame
    * header); PNG reads IHDR's big-endian dims; GIF reads the
    * little-endian logical screen descriptor. Malformed input of any kind
    * yields None, never a throw — at 10^9 payloads the garbage row is a
    * certainty, and the decode gate must classify it, not kill the job. */
  def parseImageMeta(p: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = p(i) & 0xFF
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long = (u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    try {
      if (p.length >= 24 && u8(0) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
          p(3) == 'G' && u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A &&
          u8(7) == 0x0A && p(12) == 'I' && p(13) == 'H' && p(14) == 'D' &&
          p(15) == 'R') {
        val (w, h) = (be32(16), be32(20))
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          Some(("png", w.toInt, h.toInt))
        else None
      } else if (p.length >= 13 && p(0) == 'G' && p(1) == 'I' &&
          p(2) == 'F' && p(3) == '8' && (p(4) == '7' || p(4) == '9') &&
          p(5) == 'a') {
        val (w, h) = (le16(6), le16(8))
        if (w > 0 && h > 0) Some(("gif", w, h)) else None
      } else if (p.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
        // marker-segment scan for the first SOFn (C0-CF minus C4/C8/CC)
        var i = 2
        while (i + 3 < p.length) {
          if (u8(i) != 0xFF) return None
          val m = u8(i + 1)
          if (m == 0xFF) { i += 1 } // fill byte
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i += 2 } // standalone
          else if (m == 0xD9 || m == 0xDA) return None // EOI / scan, no SOF seen
          else {
            val len = be16(i + 2)
            if (len < 2 || i + 2 + len > p.length) return None
            if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 &&
                m != 0xCC) {
              if (len < 7) return None
              val (h, w) = (be16(i + 5), be16(i + 7))
              return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
            }
            i += 2 + len
          }
        }
        None
      } else None
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Distributed payload synthesis: per-row REAL image bytes (format and
    * dimensions from columns, `body` as the opaque tail). Map-only — the
    * byte building runs inside the partition iterator, no shuffle. */
  def synthesizeMedia(df: DataFrame, id: Column, body: Column,
                      format: Column, width: Column,
                      height: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), body.cast("string").as("b"),
        format.cast("string").as("f"), width.cast("int").as("w"),
        height.cast("int").as("h"))
      .map { r =>
        (r.getLong(0),
          synthesizeImage(r.getString(2), r.getInt(3), r.getInt(4),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)),
          r.getString(2))
      }
      .toDF("doc_id", "payload", "media_type")
  }

  /** Decode + feature-extract over binary payloads. mapPartitions keeps one
    * (stub) decoder per partition — the Scala analog of mapInPandas batches:
    * amortized per-partition setup, rows streamed, no per-row codec init.
    * Image payloads get the REAL header decode ([[parseImageMeta]]):
    * media_type becomes the parsed container format and width/height come
    * from the bytes; anything unparseable falls back to the deterministic
    * stub under the caller-declared type. */
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
          val declared = r.getString(2)
          md.reset()
          val digest = md.digest(payload).map("%02x".format(_)).mkString
          parseImageMeta(payload) match {
            case Some((fmt, w, h)) =>
              MediaMeta(id, fmt, payload.length.toLong, digest, w, h, 1)
            case None =>
              val (w, h, f) = decodeStub(payload, declared)
              MediaMeta(id, declared, payload.length.toLong, digest, w, h, f)
          }
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
    // digest of the payload's HEX rendering, not the raw bytes: same
    // collision resistance, but reproducible by engines whose hash
    // functions are text-only (DuckDB md5 takes VARCHAR — raw binary
    // payloads with non-UTF8 headers could never be re-hashed there)
    val digest = md5(hex(col("payload")))
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
