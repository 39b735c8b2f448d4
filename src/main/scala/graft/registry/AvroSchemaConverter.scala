package graft.registry

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.spark.sql.types._

/** Avro `Schema` ⇄ Spark `StructType` conversion for the registry-governed
  * table surface (SURVEY.md §1.2/§1.4: topics carry Avro key+value schemas;
  * tables surface them as StructTypes).
  *
  * Covers the types observed in the reference's committed schemas
  * (SURVEY.md §1.3): primitives, `["null", T]` unions → nullable fields,
  * arrays of records (the grid Polygon), maps, enums (→ string), fixed
  * (→ binary), and the timestamp logical types the mixed time encodings
  * decode into.
  */
object AvroSchemaConverter {

  /** Avro → Spark. Returns (dataType, nullable). */
  def toSqlType(schema: Schema): (DataType, Boolean) = schema.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      schema.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _ => (IntegerType, false)
      }
    case Schema.Type.LONG =>
      schema.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          (TimestampType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED => (BinaryType, false)
    case Schema.Type.NULL => (NullType, true)
    case Schema.Type.RECORD =>
      val fields = schema.getFields.asScala.map { f =>
        val (dt, nullable) = toSqlType(f.schema())
        StructField(f.name(), dt, nullable)
      }
      (StructType(fields.toSeq), false)
    case Schema.Type.ARRAY =>
      val (dt, nullable) = toSqlType(schema.getElementType)
      (ArrayType(dt, containsNull = nullable), false)
    case Schema.Type.MAP =>
      val (dt, nullable) = toSqlType(schema.getValueType)
      (MapType(StringType, dt, valueContainsNull = nullable), false)
    case Schema.Type.UNION =>
      val branches = schema.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size == 1) {
        val (dt, _) = toSqlType(nonNull.head)
        (dt, branches.size > nonNull.size)
      } else throw new UnsupportedOperationException(
        s"only ['null', T] unions are supported, got $schema")
  }

  def toStructType(schema: Schema): StructType =
    toSqlType(schema)._1.asInstanceOf[StructType]

  /** Spark → Avro record schema. Nullable fields become `["null", T]`
    * unions with a null default (the evolution-friendly encoding). */
  def toAvroSchema(struct: StructType, recordName: String = "topLevelRecord",
      namespace: String = "graft"): Schema = {
    val fields = struct.fields.map { f =>
      val base = toAvroType(f.dataType, f.name, namespace)
      if (f.nullable)
        new Schema.Field(f.name,
          Schema.createUnion(Schema.create(Schema.Type.NULL), base),
          null, Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(f.name, base, null)
    }
    Schema.createRecord(recordName, null, namespace, false, fields.toList.asJava)
  }

  private def toAvroType(dt: DataType, name: String, namespace: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(et, containsNull) =>
      val elem = toAvroType(et, name, namespace)
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), elem) else elem)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = toAvroType(vt, name, namespace)
      Schema.createMap(
        if (valueContainsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), v) else v)
    case st: StructType => toAvroSchema(st, name, s"$namespace.$name")
    case other => throw new UnsupportedOperationException(
      s"cannot convert ${other.catalogString} to Avro")
  }
}
