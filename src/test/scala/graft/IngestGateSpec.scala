package graft

import graft.formats.AvroFunctions
import graft.registry.SchemaRegistry
import org.apache.spark.sql.functions._

/** Perf gate mirroring the reference's single embedded performance test:
  * 500,000 × 1 KB records produced at a sustained floor of ~5,556 rec/s
  * (500k in ≤ 90 s) — `integration-tests/kafka-tests.yml:14-18`,
  * BASELINE.md "Produce throughput gate". Our produce path = Avro
  * wire-encode (registry-framed) + sink write; the sink is `noop` so the
  * measurement isolates the engine's encode+pipeline cost exactly as the
  * reference's perf-test isolates the broker produce path.
  */
class IngestGateSpec extends SparkSpec {

  test("ingest gate: 500k x 1KB registry-framed Avro records >= 5,556 rec/s") {
    val reg = new SchemaRegistry
    val r = reg.register("perf-value",
      """{"type":"record","name":"perf","fields":[
        |{"name":"id","type":"long"},{"name":"payload","type":"string"}]}""".stripMargin)
    val kb = "x" * 1000
    val df = spark.range(500000).select(
      AvroFunctions.toAvroWire(
        struct(col("id"), lit(kb).as("payload")), r).as("value"))
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    val recPerSec = 500000 / secs
    info(f"ingest: 500k x 1KB in $secs%.1f s = $recPerSec%.0f rec/s (floor 5556)")
    assert(recPerSec >= 5556.0, f"below the reference's produce floor: $recPerSec%.0f rec/s")
  }
}
