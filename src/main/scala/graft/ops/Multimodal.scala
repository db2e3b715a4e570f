package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video travel
  * as opaque `binary` columns with typed metadata, and decode / feature
  * extraction runs as batched per-partition transforms.
  *
  * The Spark-side plumbing — schema, partition-level batching, function
  * signatures, lineage — is real. The codec itself is a clearly marked
  * STUB ([[DecodeStub]]): media libraries are not available in this
  * environment, so decode parses a deterministic fake header and features
  * derive from a rolling hash of the payload. Swapping in a real codec
  * changes only the stub body; every signature and the batching shape stay.
  *
  * `mapPartitions` + `Iterator.grouped(batchSize)` is the JVM analog of a
  * vectorized batch UDF: a real codec would initialize native state once
  * per batch (not per row) exactly where the stub materializes its group.
  */
object Multimodal {

  /** A media row: id + modality + opaque payload + source metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], mime_type: String, size_bytes: Long)

  /** Decoded, model-ready features. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** STUB codec — deterministic fake in place of a real image/audio/video
    * library (not installed in this container). Decode derives dimensions
    * from the first payload bytes and features from a rolling hash, so
    * results are stable across runs/executors; replace the three methods
    * with actual libjpeg/ffmpeg/etc. calls at deployment.
    */
  object DecodeStub {
    def dimensions(payload: Array[Byte]): (Int, Int) = {
      val b0 = if (payload.length > 0) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      (64 + (b0 % 16) * 32, 64 + (b1 % 16) * 32)
    }

    /** Deterministic frame sampling for video payloads: every `stride`-th
      * fixed-size byte window. Real impl: keyframe extraction.
      */
    def sampleFrames(payload: Array[Byte], maxFrames: Int): Seq[Array[Byte]] = {
      if (payload.isEmpty) return Seq.empty
      val frameSize = math.max(1, payload.length / math.max(1, maxFrames))
      payload.grouped(frameSize).take(maxFrames).toSeq
    }

    /** Deterministic stand-in for a pixel resample: payload truncated or
      * cycle-padded to the byte budget of the target dimensions. Real
      * impl: bilinear/areal resample via an image library.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, (w * h) / 256)
      val out = new Array[Byte](target)
      if (payload.nonEmpty) {
        var i = 0
        while (i < target) { out(i) = payload(i % payload.length); i += 1 }
      }
      out
    }

    /** Rolling-hash feature vector — stands in for a vision/audio encoder. */
    def features(payload: Array[Byte], dim: Int = 16): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        out(i % dim) += ((h % 1000).toFloat / 1000.0f)
        i += 1
      }
      out
    }
  }

  /** Batched decode + feature extraction. Batching shape matters: a real
    * codec amortizes setup per batch; `batchSize` bounds memory for large
    * payloads. One output row per input row, pipelined per partition — no
    * shuffle, scales linearly with partitions at 100 TB.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64, featureDim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real codec: initialize native decoder once per batch here
        batch.iterator.map { m =>
          val (w, h) = DecodeStub.dimensions(m.payload)
          val frames =
            if (m.kind == "video") DecodeStub.sampleFrames(m.payload, maxFrames = 8) else Seq(m.payload)
          val feats = frames
            .map(DecodeStub.features(_, featureDim))
            .reduceOption((a, b) => a.zip(b).map { case (x, y) => x + y })
            .getOrElse(new Array[Float](featureDim))
          MediaFeatures(m.media_id, m.kind, w, h, frames.size, feats)
        }
      }
    }
  }

  /** Batched resize to a uniform target resolution — the standard
    * normalization pass before feature extraction. Same partition-batched
    * shape as [[extractFeatures]]; payloads are rewritten, metadata
    * (dims encoded by the stub header contract) updated in place.
    */
  def resizeAll(media: Dataset[MediaRow], w: Int, h: Int, batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real codec: one native resampler instance per batch here
        batch.iterator.map { m =>
          val resized = DecodeStub.resize(m.payload, w, h)
          m.copy(payload = resized, size_bytes = resized.length.toLong)
        }
      }
    }
  }

  /** Test-path adapter: treat document text bytes as opaque media payloads
    * so the full binary-column pipeline runs against real testdata.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    graft.io.Spread.toDefaultParallelism(docs).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))
      .withColumn("mime_type", concat(lit("application/x-fake-"), col("kind")))
      .withColumn("size_bytes", length(col("payload")).cast("long"))
      .as[MediaRow]
  }
}
