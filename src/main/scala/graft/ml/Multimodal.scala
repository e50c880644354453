package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque binary payload + typed metadata — the column
  * model for image/audio/video at 100 TB (content stays `binary`, only
  * metadata is columnar/filterable). */
final case class MediaItem(doc_id: Long, format: String,
    payload: Array[Byte])

/** Stub decoder output: what a real image/audio decode would yield. */
final case class MediaFeatures(doc_id: Long, format: String,
    n_bytes: Long, width: Int, height: Int, feature: Array[Float])

/** Stub resize output: original + target geometry and the scale
  * factors a real resampler would apply. */
final case class ResizedMedia(doc_id: Long, format: String,
    width: Int, height: Int, out_w: Int, out_h: Int,
    scale_x: Double, scale_y: Double)

/** Multimodal column handling: binary payloads with typed metadata, and
  * a batched decode/feature-extract pipeline.
  *
  * The decode step is a STUB (no image/audio libraries in this
  * environment): [[decodeStub]] derives deterministic fake dimensions and
  * features from the bytes. Everything AROUND it is the real Spark
  * plumbing a production pipeline needs — binary columns flow through
  * parquet/shuffle untouched, metadata predicates (format, byte size)
  * prune before any decode, and the decoder runs batched per partition so
  * a real implementation can amortize library/model setup per BATCH (the
  * JVM-side equivalent of `mapInPandas` Arrow batching; swap
  * [[decodeStub]]'s body for JNI/FFI calls and nothing else changes).
  *
  * Scale: decode is embarrassingly parallel — no shuffle at all; the
  * only cost is the scan, which column-prunes to (doc_id, payload) and
  * pushes the format/size predicates down to parquet row-group stats.
  */
object Multimodal {
  val BatchSize = 64

  /** Attach a binary payload + media metadata to each document (the
    * fixtures carry no real media, so the payload is the UTF-8 text —
    * the column TYPES and plan shape are what matter). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("jpeg"), lit("png"), lit("wav")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Deterministic fake decode for one batch: a real decoder would hand
    * the batch to native code; dims/features here are pure functions of
    * the payload bytes so tests are reproducible. */
  def decodeStub(batch: Seq[MediaItem]): Seq[MediaFeatures] =
    batch.map { m =>
      val b0 = if (m.payload.nonEmpty) m.payload(0) & 0xff else 0
      val b1 = if (m.payload.length > 1) m.payload(1) & 0xff else 0
      val feat = Array.tabulate(8) { i =>
        (m.payload.length * (i + 1) % 257).toFloat / 257f
      }
      MediaFeatures(m.doc_id, m.format, m.payload.length.toLong,
        width = (b0 * 5) % 1024 + 16, height = (b1 * 3) % 1024 + 16, feat)
    }

  /** Batched decode over the media frame: partitions stream through the
    * decoder in [[BatchSize]] groups (bounded memory, per-batch setup
    * amortization). */
  def decodeAll(spark: SparkSession, media: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.grouped(BatchSize).flatMap(g => decodeStub(g.toSeq))
    }
  }

  /** Deterministic fake resize for one batch: a real implementation
    * hands the decoded pixel buffers to a native resampler; the scale
    * factors (one IEEE double division each) are what downstream
    * geometry consumers need either way. */
  def resizeStub(batch: Seq[MediaFeatures], outW: Int, outH: Int)
      : Seq[ResizedMedia] =
    batch.map { m =>
      ResizedMedia(m.doc_id, m.format, m.width, m.height, outW, outH,
        outW.toDouble / m.width, outH.toDouble / m.height)
    }

  /** Second typed pipeline stage: batched resize chained on the decode —
    * the decode → transform → (train) shape, still zero-shuffle. */
  def resizeAll(feats: Dataset[MediaFeatures], outW: Int = 224,
      outH: Int = 224): Dataset[ResizedMedia] = {
    import feats.sparkSession.implicits._
    feats.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(g => resizeStub(g.toSeq, outW, outH))
    }
  }

  val FrameBytes = 100
  val MaxFramesPerDoc = 8

  /** Frame sampling for "video" payloads, as pure column expressions (no
    * UDF): the payload is treated as n_bytes/[[FrameBytes]] fixed-size
    * frames; an evenly-strided sample of at most [[MaxFramesPerDoc]]
    * frame indices explodes per document and each sampled frame is
    * sliced straight out of the binary column and content-hashed.
    * Scale: the explode fans out ≤ [[MaxFramesPerDoc]] rows per doc (a
    * bounded lateral, never O(payload)), and everything stays in one
    * codegen stage — no shuffle, no driver involvement. */
  def frameSample(media: DataFrame): DataFrame = {
    val nFrames = greatest(lit(1),
      (length(col("payload")) / FrameBytes).cast("int"))
    val stride = (nFrames + (MaxFramesPerDoc - 1)) / MaxFramesPerDoc
    media
      .select(col("doc_id"), col("format"), col("payload"),
        nFrames.as("n_frames"),
        greatest(lit(1), stride).cast("int").as("stride"))
      .select(col("doc_id"), col("format"), col("n_frames").cast("long")
          .as("n_frames"),
        explode(sequence(lit(0), col("n_frames").cast("int") - 1,
          col("stride"))).as("frame_idx"),
        col("payload"))
      .select(col("doc_id"), col("format"), col("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"),
        md5(col("payload").substr(
          col("frame_idx").cast("int") * FrameBytes + 1, lit(FrameBytes)))
          .as("frame_sig"))
  }
}
