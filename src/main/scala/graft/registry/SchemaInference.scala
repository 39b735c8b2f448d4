package graft.registry

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Schema inference for SCHEMALESS JSON tables — the registry on-ramp for
  * topics that arrive without declared schemas (reference: the backblaze
  * dataset registers NULL key/value schemas, `sample-data/variables.env:8-9`;
  * SURVEY.md §1.2 maps it to engine-side inference). A user pointing the
  * engine at such a table gets a typed StructType inferred from the data
  * and a registered subject gating all subsequent writes.
  *
  * Inference is Spark's own distributed JSON schema merge (`spark.read
  * .json` over the string column): every executor infers per-partition,
  * the driver merges — no rows are collected. At 100 TB pass
  * `samplingRatio < 1` (schema stabilizes long before full coverage);
  * the default scans everything, the conservative choice.
  */
object SchemaInference {

  /** Infer the StructType of a JSON string column. */
  def inferJsonSchema(df: DataFrame, jsonCol: String, samplingRatio: Double = 1.0): StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    spark.read
      .option("samplingRatio", samplingRatio.toString)
      .json(df.select(col(jsonCol)).as[String])
      .schema
  }

  /** Infer + register as an Avro subject (B1 path for schemaless input).
    * `recordName` is the Avro record name (subject names often contain
    * '-', which Avro names reject). Returns the registration — decode
    * dispatch uses its global id like any declared schema. */
  def registerJsonSubject(
      registry: SchemaRegistry,
      subject: String,
      recordName: String,
      df: DataFrame,
      jsonCol: String,
      samplingRatio: Double = 1.0): RegisteredSchema = {
    val inferred = inferJsonSchema(df, jsonCol, samplingRatio)
    registry.register(subject,
      AvroSchemaConverter.toAvroSchema(inferred, recordName).toString)
  }
}
