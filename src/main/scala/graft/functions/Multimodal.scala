package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio/video travel as opaque
  * `binary` columns with typed metadata, decoded / feature-extracted in
  * batched partition passes (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage).
  *
  * Header metadata for PNG / JPEG / GIF is REAL byte parsing
  * ([[decodeHeader]] — no codec needed: IHDR at a fixed offset, SOF
  * marker scan, GIF logical-screen descriptor). Pixel decode beyond the
  * header remains a clearly-marked STUB — this container has no
  * image/audio codecs — but everything Spark-side is real and load-
  * bearing: the schema contract, the per-partition batching (one codec
  * context per partition, not per row), the partition sizing guidance,
  * and the deterministic fake decode used for unknown formats.
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

  /** Real image-header parse — PNG, JPEG, and GIF dimensions from raw
    * bytes, no codec required. Returns None for anything else (or for
    * truncated/corrupt headers), and [[decodeMeta]] falls back to the
    * deterministic stub there.
    *
    *  - PNG: 8-byte signature, then the IHDR chunk is mandated first —
    *    width/height are big-endian u32 at offsets 16/20.
    *  - GIF: "GIF87a"/"GIF89a", then the logical-screen descriptor —
    *    width/height are little-endian u16 at offsets 6/8.
    *  - JPEG: marker scan from SOI — skip fill bytes and zero-payload
    *    markers, hop over variable segments by their big-endian length,
    *    and read precision/height/width from the first SOFn frame header
    *    (C0–CF minus C4/C8/CC, which are DHT/JPG/DAC). Baseline and
    *    progressive both land here; hitting SOS/EOI first means no frame
    *    header → None. */
  def decodeHeader(p: Array[Byte]): Option[(Int, Int, String)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (p.length >= 24 && pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        p.slice(12, 16).sameElements("IHDR".getBytes("US-ASCII")))
      Some((be32(16), be32(20), "png"))
    else if (p.length >= 10 &&
        (p.startsWith("GIF87a".getBytes("US-ASCII")) ||
         p.startsWith("GIF89a".getBytes("US-ASCII"))))
      Some((le16(6), le16(8), "gif"))
    else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 1 < p.length && u8(i) == 0xff) {
        var j = i
        while (j < p.length && u8(j) == 0xff) j += 1 // FF fill bytes
        if (j >= p.length) return None
        val m = u8(j)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          // width ends at index j+7, so j+8 <= length is the exact bound —
          // a stream ending right after the width bytes still parses
          return if (j + 8 <= p.length) Some((be16(j + 6), be16(j + 4), "jpeg"))
                 else None
        else if (m == 0xd9 || m == 0xda) return None // EOI / SOS: no SOF seen
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i = j + 1 // standalone
        else if (j + 3 <= p.length) i = j + 1 + be16(j + 1) // length incl. itself
        else return None
      }
      None
    } else None
  }

  /** STUB decoder for formats [[decodeHeader]] doesn't recognize. A real
    * implementation would hand `payload` to an image codec here (e.g.
    * via javax.imageio / ffmpeg bindings — not available in this
    * environment). The stub derives deterministic dimensions from an
    * FNV-1a hash of the payload so the pipeline is testable end-to-end
    * with stable outputs. */
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
    * partition (the mapPartitions shape a real codec needs). PNG/JPEG/GIF
    * headers parse for real; unknown formats take the stub. */
  def decodeMeta(records: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    implicit val enc = Encoders.product[DecodedMeta]
    records.mapPartitions { it =>
      // real codec init would happen once here, per partition
      it.map { r =>
        if (r.payload == null || r.payload.isEmpty)
          DecodedMeta(r.media_id, 0L, 0, 0, "empty", ok = false)
        else {
          val (w, h, fmt) = decodeHeader(r.payload).getOrElse(decodeStub(r.payload))
          DecodedMeta(r.media_id, r.payload.length.toLong, w, h, fmt, ok = true)
        }
      }
    }
  }

  /** Header-only payload synthesizers — real, spec-conformant bytes (the
    * exact structures [[decodeHeader]] parses), used by specs and the
    * decode oracle query. Pixel data is omitted (PNG/GIF) or the stream
    * ends at SOS (JPEG): enough for any header parser, tiny on the wire. */
  object Synth {
    private def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
    private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

    /** 45 bytes: signature + IHDR (8-bit truecolor) + IEND, CRCs real. */
    def png(w: Int, h: Int): Array[Byte] = {
      def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
        val body = tag.getBytes("US-ASCII") ++ data
        val crc = new java.util.zip.CRC32
        crc.update(body)
        be32(data.length) ++ body ++ be32(crc.getValue.toInt)
      }
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)) ++
        chunk("IEND", Array.empty[Byte])
    }

    /** GIF89a header + logical-screen descriptor + trailer (14 bytes). */
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
        Array[Byte](0, 0, 0, 0x3b.toByte)

    /** SOI + JFIF APP0 + SOFn (baseline C0 or progressive C2, one
      * grayscale component) — the minimal stream a SOF scan must cross. */
    def jpeg(w: Int, h: Int, progressive: Boolean = false): Array[Byte] = {
      val sof = if (progressive) 0xc2 else 0xc0
      Array(0xff, 0xd8).map(_.toByte) ++                        // SOI
        (Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++          // APP0, len 16
          "JFIF\u0000".getBytes("US-ASCII") ++
          Array[Byte](1, 1, 0) ++ be16(1) ++ be16(1) ++
          Array[Byte](0, 0)) ++
        (Array(0xff, sof).map(_.toByte) ++ be16(11) ++           // SOFn, len 11
          Array[Byte](8) ++ be16(h) ++ be16(w) ++
          Array[Byte](1, 0x11, 0))                               // 1 component
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
