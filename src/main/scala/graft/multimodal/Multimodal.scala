package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, decoded in batched `mapPartitions` passes.
  *
  * The decode step is a REAL pure-JVM container-header parse — PNG (IHDR
  * chunk), JPEG (SOFn segment walk), GIF87a/89a (logical screen descriptor
  * + image-descriptor frame count) — no codec libraries involved; pixel
  * decoding would slot into the same mapPartitions seam. Unknown payloads
  * degrade to fmt "bin" with zero dimensions instead of failing the task
  * (corpus binaries are arbitrary; a poison payload must not kill a batch).
  *
  * Scale: decode is row-parallel; partitions should be sized by
  * `spark.sql.files.maxPartitionBytes` so one partition's payloads fit in
  * executor memory (binary columns dominate row size). No shuffle anywhere.
  */
object MediaDecoder {

  case class MediaMeta(fmt: String, width: Int, height: Int, nFrames: Int)
  case class DecodedRow(doc_id: Long, fmt: String, width: Int, height: Int,
                        nFrames: Int)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def u16le(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)
  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Parse container metadata from the payload's leading bytes. */
  def decodeHeader(b: Array[Byte]): MediaMeta = {
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
        new String(b, 12, 4, "US-ASCII") == "IHDR")
      MediaMeta("png", u32be(b, 16), u32be(b, 20), 1)
    else if (b.length >= 13 &&
             (new String(b, 0, 6, "US-ASCII") == "GIF89a" ||
              new String(b, 0, 6, "US-ASCII") == "GIF87a"))
      decodeGif(b)
    else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8)
      decodeJpeg(b)
    else MediaMeta("bin", 0, 0, 0)
  }

  /** GIF: dimensions from the logical screen descriptor; frame count by
    * walking the block structure (image descriptors 0x2C, extensions 0x21
    * with length-prefixed sub-blocks) — a 0x2C byte inside pixel data is
    * NOT a frame, so a naive byte scan would overcount. */
  private def decodeGif(b: Array[Byte]): MediaMeta = {
    val w = u16le(b, 6); val h = u16le(b, 8)
    val packed = b(10) & 0xFF
    var pos = 13 + (if ((packed & 0x80) != 0) 3 << ((packed & 7) + 1) else 0)
    var frames = 0
    def skipSubBlocks(): Unit = {
      while (pos < b.length && b(pos) != 0) pos += 1 + (b(pos) & 0xFF)
      pos += 1 // the 0x00 block terminator
    }
    var halt = false
    while (!halt && pos < b.length) {
      (b(pos) & 0xFF) match {
        case 0x2C if pos + 10 <= b.length =>
          frames += 1
          val lp = b(pos + 9) & 0xFF
          pos += 10 + (if ((lp & 0x80) != 0) 3 << ((lp & 7) + 1) else 0)
          pos += 1 // LZW minimum code size
          skipSubBlocks()
        case 0x21 => pos += 2; skipSubBlocks() // extension: label + blocks
        case _    => halt = true               // 0x3B trailer or malformed
      }
    }
    MediaMeta("gif", w, h, frames)
  }

  /** JPEG: walk FF-marker segments from SOI to the first SOFn frame header
    * (C0-CF except C4/C8/CC) and read (height, width) from it. */
  private def decodeJpeg(b: Array[Byte]): MediaMeta = {
    var pos = 2
    while (pos + 4 <= b.length && (b(pos) & 0xFF) == 0xFF) {
      var mPos = pos + 1
      while (mPos < b.length && (b(mPos) & 0xFF) == 0xFF) mPos += 1 // fill
      if (mPos >= b.length) return MediaMeta("bin", 0, 0, 0)
      val marker = b(mPos) & 0xFF
      if (marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
        if (mPos + 8 >= b.length) return MediaMeta("bin", 0, 0, 0)
        return MediaMeta("jpg", u16be(b, mPos + 6), u16be(b, mPos + 4), 1)
      } else if (marker == 0xD9 || marker == 0xDA) {
        return MediaMeta("bin", 0, 0, 0) // hit EOI/SOS without a SOF
      } else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        pos = mPos + 1 // standalone marker, no length field
      } else {
        if (mPos + 2 >= b.length) return MediaMeta("bin", 0, 0, 0)
        pos = mPos + 1 + u16be(b, mPos + 1)
      }
    }
    MediaMeta("bin", 0, 0, 0)
  }

  /** Decode over (doc_id, content: binary), one payload live at a time —
    * the binary column dominates row size, so any buffering (a grouped()
    * batch) RAISES peak task memory rather than bounding it. mapPartitions
    * (not a per-row UDF) so a heavier decoder can init its codec once per
    * partition; reintroduce batching only when a real codec needs
    * per-batch inference calls. */
  def decodeMeta(rows: Dataset[(Long, Array[Byte])]): Dataset[DecodedRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map { case (id, bytes) =>
      val m = decodeHeader(bytes)
      DecodedRow(id, m.fmt, m.width, m.height, m.nFrames)
    })
  }

  /** Deterministic frame sampling: every `stride`-th frame index of a video
    * payload (metadata-only here; a real pipeline would slice the payload).
    * Frame-less rows (nFrames = 0 — the real decoder emits these for "bin"
    * payloads and truncated GIFs, unlike the old stub) sample nothing:
    * `sequence(0, -1)` would throw, so they take the empty-array branch and
    * explode drops them. */
  def frameSample(decoded: Dataset[DecodedRow], stride: Int = 2): DataFrame =
    decoded.toDF().select(
      col("doc_id"),
      explode(when(col("nFrames") > 0,
          sequence(lit(0), col("nFrames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>")))
        .as("frame_idx"))
}

/** The driver-oracle query: metadata derived arithmetically from doc_id →
  * [[MediaFixtures]] header bytes → decoded BACK through the real
  * [[MediaDecoder.decodeMeta]] mapPartitions path. The oracle recomputes
  * the same arithmetic in SQL, so any parser/generator disagreement (fmt,
  * dimensions, frame walk) breaks the row. */
object MultimodalQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  def decodeMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val payloads = graft.core.Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val w = (id % 640 + 16).toInt
        val h = (id * 7 % 480 + 16).toInt
        (id, (id % 3) match {
          case 0 => MediaFixtures.png(w, h)
          case 1 => MediaFixtures.jpeg(w, h)
          case _ => MediaFixtures.gif(w, h, (id % 10 + 1).toInt)
        })
      }
    MediaDecoder.decodeMeta(payloads).toDF()
      .withColumnRenamed("nFrames", "n_frames")
  }

  val decodeMetaSql: String =
    """SELECT doc_id,
       CASE CAST(doc_id%3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpg'
            ELSE 'gif' END AS fmt,
       CAST(doc_id%640+16 AS INT) AS width,
       CAST((doc_id*7)%480+16 AS INT) AS height,
       CAST(CASE WHEN doc_id%3=2 THEN doc_id%10+1 ELSE 1 END AS INT)
         AS n_frames
       FROM documents"""
}

/** Deterministic minimal-but-valid media headers for fixtures and the
  * driver oracle (the generator side of the decode round-trip; real files
  * from these formats parse with the same code paths). */
object MediaFixtures {

  def png(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    bb.putInt(13)
    val chunk = java.nio.ByteBuffer.allocate(17)
    chunk.put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.put(chunk.array())
    val crc = new java.util.zip.CRC32()
    crc.update(chunk.array())
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  def jpeg(w: Int, h: Int): Array[Byte] = {
    def hi(v: Int) = ((v >> 8) & 0xFF).toByte
    def lo(v: Int) = (v & 0xFF).toByte
    Array[Byte](
      0xFF.toByte, 0xD8.toByte,                         // SOI
      0xFF.toByte, 0xE0.toByte, 0x00, 0x04, 'J', 'F',   // APP0 (len 4)
      0xFF.toByte, 0xC0.toByte, 0x00, 0x0B,             // SOF0 (len 11)
      0x08, hi(h), lo(h), hi(w), lo(w),
      0x01, 0x01, 0x11, 0x00,                           // 1 component
      0xFF.toByte, 0xD9.toByte)                         // EOI
  }

  def gif(w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= "GIF89a".getBytes("US-ASCII")
    def le(v: Int): Seq[Byte] = Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    out ++= le(w); out ++= le(h)
    out += 0x00; out += 0x00; out += 0x00 // no GCT, bg, aspect
    for (_ <- 0 until frames) {
      out += 0x2C                          // image descriptor
      out ++= le(0); out ++= le(0); out ++= le(w); out ++= le(h)
      out += 0x00                          // no local color table
      out += 0x02                          // LZW min code size
      out += 0x01; out += 0x2C.toByte      // 1-byte data sub-block (0x2C on
                                           // purpose: pixel data must not
                                           // count as a frame)
      out += 0x00                          // sub-block terminator
    }
    out += 0x3B.toByte                     // trailer
    out.toArray
  }
}
