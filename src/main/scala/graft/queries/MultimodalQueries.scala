package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column query pack: binary payload plumbing + metadata
  * extraction (oracle-verified) and the partition-parallel decode path
  * (rows-only: the decode kernel is engine-side by definition).
  */
object MultimodalQueries {

  def q60MultimodalMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.metadata(
      Multimodal.synthMediaTable(Tables.documents(s, d), "doc_id", "text"))

  // Real codec round-trip: deterministic grayscale PNGs are encoded AND
  // decoded with javax.imageio, resized (nearest-neighbor) and re-decoded;
  // the oracle replays the generator arithmetic in SQL, so width/height/
  // mean-luma (original and resized) are fully hash-checked — the gate
  // proves the codec, not just the binary plumbing.
  def q61MultimodalDecode(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeImageFeatures(s,
      Multimodal.synthImageTable(s, Tables.documents(s, d), "doc_id")).toDF()

  // Frame sampling over binary payloads: 32-byte "frames", every 4th kept.
  // Pure-Catalyst slicing → DuckDB replicates it exactly (oracle-checked).
  def q62MultimodalFrames(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Multimodal.frameSample(
        Multimodal.synthMediaTable(Tables.documents(s, d), "doc_id", "text"),
        frameSize = 32, everyK = 4)
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).as("n_bytes"),
        hex(col("frame")).as("frame_hex"))
  }

  // Audio twin of q61: deterministic 16-bit mono PCM clips are
  // WAV-encoded AND decoded with javax.sound.sampled; decoded sample
  // statistics hash-check against the SQL replay of the generator.
  def q63AudioDecode(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeAudioFeatures(s,
      Multimodal.synthAudioTable(s, Tables.documents(s, d), "doc_id")).toDF()

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_multimodal_meta" -> q60MultimodalMeta,
    "q61_multimodal_decode" -> q61MultimodalDecode,
    "q62_multimodal_frames" -> q62MultimodalFrames,
    "q63_audio_decode" -> q63AudioDecode)

  val oracles: Map[String, String] = Map(
    // Replays the image-generator arithmetic (w = 8 + id%7, h = 8 + id%5,
    // luma(x,y) = (id*7 + 5x + 3y) % 256; resize samples even (x,y)):
    // matching this PROVES imageio encode→decode→resample round-trips the
    // exact raster.
    "q61_multimodal_decode" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(8 + doc_id % 7 AS INT) AS w, CAST(8 + doc_id % 5 AS INT) AS h
           FROM documents
         ), g AS (
           SELECT d.doc_id, d.w, d.h,
             CAST(sum((d.doc_id * 7 + x.x * 5 + y.y * 3) % 256) AS BIGINT) AS s,
             CAST(sum(CASE WHEN x.x % 2 = 0 AND y.y % 2 = 0
               THEN (d.doc_id * 7 + x.x * 5 + y.y * 3) % 256 ELSE 0 END) AS BIGINT) AS rs
           FROM d
           JOIN (SELECT unnest(generate_series(0, 13)) AS x) x ON x.x < d.w
           JOIN (SELECT unnest(generate_series(0, 11)) AS y) y ON y.y < d.h
           GROUP BY d.doc_id, d.w, d.h
         )
         SELECT doc_id, w AS width, h AS height,
           CAST(s AS DOUBLE) / (w * h) AS mean_luma,
           CAST(ceil(w / 2.0) AS INT) AS rz_width,
           CAST(ceil(h / 2.0) AS INT) AS rz_height,
           CAST(rs AS DOUBLE) /
             (CAST(ceil(w / 2.0) AS INT) * CAST(ceil(h / 2.0) AS INT)) AS rz_mean_luma
         FROM g""",
    // Replays the PCM generator (n = 64 + id%64, sample(t) =
    // (id*31 + t*17) % 2003 - 1001): matching proves the WAV container +
    // 16-bit PCM frames round-trip exactly through javax.sound.
    "q63_audio_decode" ->
      """WITH d AS (
           SELECT doc_id, CAST(64 + doc_id % 64 AS INT) AS n FROM documents
         ), s AS (
           SELECT d.doc_id, d.n,
             (d.doc_id * 31 + t.t * 17) % 2003 - 1001 AS v
           FROM d JOIN (SELECT unnest(generate_series(0, 126)) AS t) t ON t.t < d.n
         )
         SELECT doc_id, 8000 AS sample_rate, n AS n_samples,
           CAST(max(abs(v)) AS INT) AS peak_amp,
           CAST(CAST(sum(v * v) AS BIGINT) AS DOUBLE) / n AS mean_square
         FROM s GROUP BY doc_id, n""",
    "q60_multimodal_meta" ->
      """SELECT doc_id,
         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
         octet_length(text::BLOB) AS n_bytes,
         substring(hex(text::BLOB), 1, 12) AS header_hex,
         ('0x' || substring(md5(text), 1, 15))::BIGINT AS content_hash
         FROM documents""",
    "q62_multimodal_frames" ->
      """WITH m AS (
           SELECT doc_id, hex(text::BLOB) AS h FROM documents
           WHERE octet_length(text::BLOB) > 0
         ), idx AS (
           SELECT doc_id, h,
             unnest(generate_series(0,
               CAST(floor((length(h) / 2 - 1) / 32.0) AS INT))) AS frame_idx
           FROM m
         )
         SELECT doc_id, frame_idx,
           CAST(length(substring(h, frame_idx * 64 + 1, 64)) / 2 AS BIGINT) AS n_bytes,
           substring(h, frame_idx * 64 + 1, 64) AS frame_hex
         FROM idx WHERE frame_idx % 4 = 0""")
}
