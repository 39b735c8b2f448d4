package graft.operators

import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and per-batch "decode / feature
  * extract" runs as a partition-parallel transform (LLM-pipeline surface).
  *
  * The image path uses a REAL codec: `javax.imageio` (in every JRE)
  * encodes/decodes 8-bit grayscale PNGs, and [[resizeImage]] is a real
  * nearest-neighbor resampler over the decoded raster. Payloads are
  * synthesized ([[synthImageTable]]) because no external media ships in
  * the container — but synthesized DETERMINISTICALLY from arithmetic on
  * `doc_id`, so the decoded statistics (width/height/mean luma, before and
  * after resize) are oracle-checkable in plain SQL: the gate proves the
  * codec round-trip, not just the plumbing. Audio/video remain opaque
  * binary + metadata/frame-slicing plumbing ([[metadata]], [[frameSample]]).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte])
  case class ImageRecord(doc_id: Long, payload: Array[Byte])
  case class ImageFeatures(doc_id: Long, width: Int, height: Int, mean_luma: Double,
      rz_width: Int, rz_height: Int, rz_mean_luma: Double)

  /** Wrap a text corpus as a binary "media" table: payload = utf-8 bytes,
    * modality assigned deterministically. Stands in for reading real blobs
    * (at scale: parquet binary columns or object-store pointers). */
  def synthMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      col(textCol).cast("binary").as("payload"))

  /** STUB decode kernel — deterministic fake standing in for a real codec
    * (e.g. JPEG decode + embedding). Signature and per-partition batch shape
    * are the real contract; the body would be replaced by a native library
    * call. */
  def fakeDecode(payload: Array[Byte]): Double = {
    // ??? real codec goes here; deterministic fake: mean byte value.
    if (payload.isEmpty) 0.0 else payload.map(_ & 0xff).sum.toDouble / payload.length
  }

  /** Partition-parallel decode: the Dataset[T] analog of a Pandas-UDF
    * `mapInPandas` — one JVM call per partition, rows streamed through the
    * kernel, no per-row UDF dispatch overhead. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "modality", "payload").as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val header = r.payload.take(6).map(b => f"${b & 0xff}%02X").mkString
          MediaFeatures(
            doc_id = r.doc_id,
            modality = r.modality,
            n_bytes = r.payload.length,
            header_hex = header,
            content_hash = java.lang.Long.parseLong(
              java.security.MessageDigest.getInstance("MD5")
                .digest(r.payload).map(b => f"${b & 0xff}%02x").mkString.take(15), 16),
            feature = fakeDecode(r.payload))
        }
      }
  }

  /** Frame sampling: split a binary payload into fixed-size frames and
    * keep every `everyK`-th — the video-frame-sampling plumbing (frame
    * boundaries here are byte-offset stubs; a real container demuxer
    * would replace the slicing, not the plan). Pure Catalyst: sequence +
    * substring on binary, exploded with position — codegen-friendly and
    * fully distributed. */
  def frameSample(media: DataFrame, frameSize: Int, everyK: Int): DataFrame = {
    require(frameSize > 0 && everyK > 0)
    val nFramesMinus1 = floor((octet_length(col("payload")) - 1) / frameSize).cast("int")
    media
      .filter(octet_length(col("payload")) > 0)
      .select(col("doc_id"), col("modality"),
        posexplode(transform(sequence(lit(0), nFramesMinus1),
          i => substring(col("payload"), (i * frameSize + 1).cast("int"), lit(frameSize))))
          .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % everyK === 0)
  }

  /** STUB resize kernel: deterministic byte-stride downsample standing in
    * for an image resize (every `factor`-th byte). Same partition-parallel
    * contract as [[decodeFeatures]]. */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    // ??? real resize goes here; deterministic fake keeps every factor-th byte.
    payload.indices.collect { case i if i % factor == 0 => payload(i) }.toArray
  }

  /** Column-only metadata extraction (no kernel boundary) — what a pure
    * Catalyst plan can get from a binary column: sizes, headers, hashes. */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("modality"),
      octet_length(col("payload")).as("n_bytes"),
      substring(hex(col("payload")), 1, 12).as("header_hex"),
      Portable.md5Long60(col("payload")).as("content_hash"))
}
