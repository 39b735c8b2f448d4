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

  def q61MultimodalDecode(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeFeatures(s,
      Multimodal.synthMediaTable(Tables.documents(s, d), "doc_id", "text")).toDF()

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_multimodal_meta" -> q60MultimodalMeta,
    "q61_multimodal_decode" -> q61MultimodalDecode)

  val oracles: Map[String, String] = Map(
    "q60_multimodal_meta" ->
      """SELECT doc_id,
         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
         octet_length(text::BLOB) AS n_bytes,
         substring(hex(text::BLOB), 1, 12) AS header_hex,
         ('0x' || substring(md5(text), 1, 15))::BIGINT AS content_hash
         FROM documents""")
}
