package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio/video travel as opaque
  * `binary` columns with typed metadata, decoded / feature-extracted in
  * batched partition passes (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage).
  *
  * The decode itself is a clearly-marked STUB — this container has no
  * image/audio codecs — but everything Spark-side is real and load-
  * bearing: the schema contract, the per-partition batching (one codec
  * context per partition, not per row), the partition sizing guidance,
  * and the deterministic fake decode used by tests.
  *
  * Scale notes: binary payloads dominate row size, so (a) keep
  * `spark.sql.files.maxPartitionBytes` at/below 128 MB so a partition of
  * images fits executor memory; (b) never collect payloads — metadata
  * projections must prune the binary column (columnar parquet makes the
  * meta-only scan free); (c) decode stages should repartition by
  * byte-size salt when payload sizes are skewed.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, payload: Array[Byte], mimeType: String)

  final case class DecodedMeta(media_id: Long, n_bytes: Long, width: Int,
                               height: Int, format: String, ok: Boolean)

  /** STUB decoder. A real implementation would hand `payload` to an
    * image codec here (e.g. via javax.imageio / ffmpeg bindings — not
    * available in this environment). The stub derives deterministic
    * dimensions from an FNV-1a hash of the payload so the pipeline is
    * testable end-to-end with stable outputs. */
  def decodeStub(payload: Array[Byte]): (Int, Int, String) = {
    var h = 2166136261L
    var i = 0
    while (i < payload.length) {
      h = (h ^ (payload(i) & 0xff)) * 16777619L & 0xffffffffL
      i += 1
    }
    val width = 64 + (h % 1857L).toInt
    val height = 64 + ((h / 2048L) % 1081L).toInt
    (width, height, "fake")
  }

  /** Decode metadata per partition: one pass, codec context reused per
    * partition (the mapPartitions shape a real codec needs). */
  def decodeMeta(records: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    implicit val enc = Encoders.product[DecodedMeta]
    records.mapPartitions { it =>
      // real codec init would happen once here, per partition
      it.map { r =>
        if (r.payload == null || r.payload.isEmpty)
          DecodedMeta(r.media_id, 0L, 0, 0, "empty", ok = false)
        else {
          val (w, h, fmt) = decodeStub(r.payload)
          DecodedMeta(r.media_id, r.payload.length.toLong, w, h, fmt, ok = true)
        }
      }
    }
  }

  /** Resize stage STUB: emits the target dimensions + a payload
    * truncated to a deterministic sample (a real impl re-encodes).
    * Demonstrates a binary-in/binary-out partition stage. */
  def resizeStub(records: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    records.mapPartitions(_.map { r =>
      val sample = if (r.payload.length > maxDim) r.payload.take(maxDim) else r.payload
      MediaRecord(r.media_id, sample, r.mimeType)
    })
  }

  /** Frame-sampling stage STUB for video-like payloads: every k-th
    * chunk of `chunkBytes` becomes one "frame" row (explode shape). */
  def frameSampleStub(records: Dataset[MediaRecord], chunkBytes: Int,
                      everyK: Int): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.flatMap { r =>
      r.payload.grouped(chunkBytes).zipWithIndex
        .filter(_._2 % everyK == 0)
        .map { case (chunk, idx) => (r.media_id, idx, chunk.length) }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Metadata-only projection — must NOT touch the binary column, so the
    * parquet reader prunes it (assert via `.explain` ReadSchema). */
  def metaProjection(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("mime_type"), col("n_bytes"))
}
