package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, decoded in batched `mapPartitions` passes.
  *
  * The decode step itself is a STUB (this container has no image/audio
  * libraries): [[MediaDecoder.stubDecode]] derives deterministic fake
  * metadata from the payload bytes. Everything around it — the schema, the
  * typed Dataset, the per-partition batching (so a real decoder amortizes
  * model/codec init per batch, not per row), the frame-sampling shape — is
  * real Spark plumbing and is tested for equality against the pure-Column
  * reference implementation.
  *
  * Scale: decode is row-parallel; partitions should be sized by
  * `spark.sql.files.maxPartitionBytes` so one partition's payloads fit in
  * executor memory (binary columns dominate row size). No shuffle anywhere.
  */
object MediaDecoder {

  case class MediaMeta(fmt: String, width: Int, height: Int, nFrames: Int)
  case class DecodedRow(doc_id: Long, fmt: String, width: Int, height: Int,
                        nFrames: Int)

  /** STUB decoder — deterministic fake in place of a real codec.
    * Swap this body for an image/audio library call in deployment; the
    * function contract (bytes → typed metadata) is the real one. */
  def stubDecode(bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val fmt = (n % 3) match {
      case 0 => "png"; case 1 => "jpg"; case _ => "webp"
    }
    MediaMeta(fmt, (n % 640 + 16).toInt, (n * 7 % 480 + 16).toInt,
              (n % 10 + 1).toInt)
  }

  /** Batched decode over (doc_id, content: binary). Batch size bounds peak
    * decoded-buffer memory per task; a real decoder would init its codec
    * once per partition here (the reason this is mapPartitions and not a
    * per-row UDF). */
  def decodeMeta(rows: Dataset[(Long, Array[Byte])],
                 batchSize: Int = 64): Dataset[DecodedRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real decoder: codec.decodeAll(batch) — amortized init lives here
        batch.iterator.map { case (id, bytes) =>
          val m = stubDecode(bytes)
          DecodedRow(id, m.fmt, m.width, m.height, m.nFrames)
        }
      }
    }
  }

  /** Deterministic frame sampling: every `stride`-th frame index of a video
    * payload (metadata-only here; a real pipeline would slice the payload). */
  def frameSample(decoded: Dataset[DecodedRow], stride: Int = 2): DataFrame =
    decoded.toDF().select(
      col("doc_id"),
      explode(sequence(lit(0), col("nFrames") - 1, lit(stride)))
        .as("frame_idx"))

  /** Pure-Column equivalent of decodeMeta (used as the DuckDB-checkable
    * query and as the equality reference for the mapPartitions path). */
  def decodeMetaColumns(df: DataFrame): DataFrame = {
    val n = octet_length(col("content")).cast("long")
    df.select(
      col("doc_id"),
      when(n % 3 === 0, "png").when(n % 3 === 1, "jpg").otherwise("webp")
        .as("fmt"),
      (n % 640 + 16).cast("int").as("width"),
      (n * 7 % 480 + 16).cast("int").as("height"),
      (n % 10 + 1).cast("int").as("n_frames"))
  }
}
