package graft.sources

import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._

import graft.formats.AvroFunctions
import graft.registry.SchemaRegistry

/** Kafka source/sink edge configuration — the engine's mapping of the
  * reference's topic surface onto Spark's Kafka connector (SURVEY.md §1.4,
  * §2C C1/C16).
  *
  * A topic table declares (topic, partitions, startingOffsets) plus its
  * registry subjects; reads decode the Confluent-framed key/value through
  * `graft.formats.AvroFunctions.fromAvroRegistry` and expose Kafka
  * metadata as `_partition`, `_offset`, `_ts` pseudo-columns (the
  * reference's browse-SQL pseudo-columns).
  *
  * These builders only assemble configuration + decode plans; they run
  * wherever `spark-sql-kafka` is on the classpath (not shipped in this
  * build environment — every other layer, including the Avro wire codec
  * they compose with, is exercised by the specs without a broker).
  */
object KafkaEdges {

  final case class TopicTable(
      topic: String,
      bootstrapServers: String,
      valueSubject: String,
      keySubject: Option[String] = None,
      minPartitions: Option[Int] = None,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None)

  private def commonOptions(t: TopicTable): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> t.bootstrapServers,
      "subscribe" -> t.topic,
      "startingOffsets" -> t.startingOffsets) ++
      t.minPartitions.map("minPartitions" -> _.toString) ++
      t.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** Batch browse read (`SELECT … FROM topic`): full-log scan decoded to
    * the subject's reader schema. */
  def batchReader(spark: SparkSession, t: TopicTable): DataFrameReader =
    commonOptions(t).foldLeft(spark.read.format("kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }

  /** Continuous read (`SELECT STREAM … FROM topic`). */
  def streamReader(spark: SparkSession, t: TopicTable): DataStreamReader =
    commonOptions(t).foldLeft(spark.readStream.format("kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }

  /** Decode a raw Kafka DataFrame (key/value/topic/partition/offset/
    * timestamp) into the table view: registry-decoded `_key`/columns +
    * pseudo-columns. Works identically on batch and streaming inputs. */
  def decode(raw: DataFrame, registry: SchemaRegistry, t: TopicTable): DataFrame = {
    val withValue = raw.select(
      AvroFunctions.fromAvroRegistry(col("value"), registry, t.valueSubject).as("_value"),
      t.keySubject.map(ks =>
        AvroFunctions.fromAvroRegistry(col("key"), registry, ks).as("_key"))
        .getOrElse(lit(null).as("_key")),
      col("partition").as("_partition"),
      col("offset").as("_offset"),
      col("timestamp").as("_ts"))
    withValue.select(col("_value.*"), col("_key"), col("_partition"), col("_offset"), col("_ts"))
  }

  /** Sink options for `INSERT INTO topic SELECT …` (C16): the write side
    * expects a `value` (and optional `key`) binary column — produce them
    * with `AvroFunctions.toAvroWire`. Compression maps the reference's
    * per-topic codecs (`variables.env:10`). */
  def sinkOptions(t: TopicTable, compression: String = "lz4"): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> t.bootstrapServers,
      "topic" -> t.topic,
      "kafka.compression.type" -> compression)
}
