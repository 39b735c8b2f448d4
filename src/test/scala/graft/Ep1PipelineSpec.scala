package graft

import java.nio.file.Files

import graft.formats.AvroFunctions
import graft.registry.{AvroSchemaConverter, SchemaRegistry}
import graft.streaming.Pipelines
import org.apache.spark.sql.functions._

/** EP1 capstone (SURVEY.md §3): the reference's continuous-ingest path —
  * rate-modulated generator → registry-framed Avro produce → topic →
  * independent consumer decoding + windowed SQL — rebuilt end-to-end from
  * this engine's own components:
  *
  *   graft-rate source → to_avro_wire(registry v1) → "topic" (parquet log
  *   of framed binary records) → file-tail stream → from_avro_registry →
  *   10-second tumbling window aggregation → memory sink.
  *
  * Every hop is the Spark-native analog of the reference hop (normcat →
  * avro console producer → broker → Lenses SQL), and the arithmetic is
  * checkable because the generator is deterministic.
  */
class Ep1PipelineSpec extends SparkSpec {

  test("EP1: generator -> framed avro topic -> decode -> windowed aggregation") {
    val topicDir = Files.createTempDirectory("ep1-topic").toString
    val ckRoot = Files.createTempDirectory("ep1-ck").toString
    val pipes = new Pipelines(ckRoot)
    val reg = new SchemaRegistry

    try {
      // producer side: register the generator's schema, encode, produce
      val genSchema = spark.readStream.format("graft-rate").load().schema
      val v1 = reg.register("gen-value",
        AvroSchemaConverter.toAvroSchema(genSchema, "gen").toString)
      val producer = pipes.start("producer",
        spark.readStream.format("graft-rate")
          .option("rowsPerSecond", "20").option("jitter", "0").option("periodSeconds", "0")
          .option("advancePerBatchSeconds", "10").option("startTimestamp", "0")
          .load()
          .select(AvroFunctions.toAvroWire(
            struct(col("ts"), col("seq"), col("value")), v1).as("value")),
        w => w.format("parquet").option("path", topicDir).outputMode("append"))
      // wait for >= 2 COMMITTED logical batches (400 rows) instead of a
      // fixed sleep: on a cold JVM stream startup alone can eat seconds,
      // and stopping before the first commit leaves an empty topic dir
      // that fails the batch read below
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (producer.recentProgress.map(_.numInputRows).sum < 400 &&
          System.nanoTime() < deadline)
        Thread.sleep(100)
      pipes.stop("producer")

      val framed = spark.read.parquet(topicDir)
      val produced = framed.count()
      assert(produced > 0 && produced % 200 == 0,
        s"constant rate 20/s with 10s logical batches must produce multiples of 200, got $produced")

      // consumer side: independent stream over the topic, decode, window
      pipes.start("consumer",
        spark.readStream.schema(framed.schema).parquet(topicDir)
          .select(AvroFunctions.fromAvroRegistry(col("value"), reg, "gen-value").as("rec"))
          .select("rec.*")
          .groupBy(window(col("ts"), "10 seconds").as("w"))
          .agg(count(lit(1)).as("n"), sum(col("seq")).as("sum_seq")),
        w => w.format("memory").outputMode("complete"))
      pipes.awaitDrained("consumer")

      val windows = spark.table("consumer")
        .select(col("w.start").cast("long").as("start_s"), col("n"), col("sum_seq"))
        .orderBy("start_s").collect()
      // constant 20 rec/s => every 10-second window holds exactly 200 records
      assert(windows.forall(_.getLong(1) == 200L),
        windows.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))
      assert(windows.map(_.getLong(1)).sum == produced)
      // seq is dense across the whole run: total sum matches N(N-1)/2
      val n = produced
      assert(windows.map(_.getLong(2)).sum == n * (n - 1) / 2)
    } finally pipes.stopAll()
  }
}
