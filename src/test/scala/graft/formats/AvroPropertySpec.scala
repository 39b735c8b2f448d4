package graft.formats

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.registry.{AvroSchemaConverter, SchemaRegistry}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Test => SCTest, Prop}

/** Property-based coverage of the format layer (SURVEY.md §5 test
  * strategy): schema round-trips, value round-trips through the wire
  * codec, and the compatibility laws the registry must enforce.
  */
class AvroPropertySpec extends SparkSpec {

  private def check(prop: Prop, sizes: Int = 60): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(sizes), prop)
    assert(res.passed, res.status.toString)
  }

  // -- generators ----------------------------------------------------------

  private val primitiveGen: Gen[DataType] = Gen.oneOf(
    BooleanType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BinaryType, DateType, TimestampType)

  private val dataTypeGen: Gen[DataType] = Gen.frequency(
    6 -> primitiveGen,
    2 -> primitiveGen.flatMap(et => Gen.oneOf(true, false).map(n => ArrayType(et, n))),
    1 -> primitiveGen.flatMap(vt => Gen.oneOf(true, false).map(n => MapType(StringType, vt, n))),
    1 -> Gen.listOfN(2, primitiveGen).map(ts => StructType(
      ts.zipWithIndex.map { case (t, i) => StructField(s"n$i", t, nullable = true) })))

  private val structGen: Gen[StructType] = for {
    n <- Gen.choose(1, 6)
    types <- Gen.listOfN(n, dataTypeGen)
    nulls <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield StructType(types.zip(nulls).zipWithIndex.map {
    case ((t, nl), i) => StructField(s"f$i", t, nl)
  })

  private def valueGen(dt: DataType): Gen[Any] = dt match {
    case BooleanType => Gen.oneOf(true, false)
    case IntegerType => Gen.choose(Int.MinValue, Int.MaxValue)
    case LongType => Gen.choose(Long.MinValue, Long.MaxValue)
    case FloatType => Gen.choose(-1e6f, 1e6f)
    case DoubleType => Gen.choose(-1e9, 1e9)
    case StringType => Gen.alphaNumStr.map(_.take(24))
    case BinaryType => Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    case DateType => Gen.choose(-30000, 30000).map(java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(0)).toLocalDate.plusDays(_)).map(java.sql.Date.valueOf)
    case TimestampType => Gen.choose(-4102444800L, 4102444800L)
      .map(s => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s, 123000)))
    case ArrayType(et, cn) =>
      Gen.listOfN(3, if (cn) Gen.frequency(4 -> valueGen(et), 1 -> Gen.const(null))
        else valueGen(et)).map(_.toSeq)
    case MapType(_, vt, cn) => Gen.listOfN(2, for {
        k <- Gen.alphaNumStr.map(_.take(8))
        v <- if (cn) Gen.frequency(4 -> valueGen(vt), 1 -> Gen.const(null)) else valueGen(vt)
      } yield k -> v).map(_.toMap)
    case st: StructType => rowGen(st)
    case other => throw new IllegalArgumentException(other.toString)
  }

  private def rowGen(st: StructType): Gen[Row] =
    st.fields.foldLeft(Gen.const(Vector.empty[Any])) { (acc, f) =>
      val g = if (f.nullable) Gen.frequency(5 -> valueGen(f.dataType), 1 -> Gen.const(null))
        else valueGen(f.dataType)
      for { xs <- acc; v <- g } yield xs :+ v
    }.map(vs => Row.fromSeq(vs))

  // -- normalization for comparing collected rows ---------------------------

  private def norm(v: Any): Any = v match {
    case b: Array[Byte] => b.toSeq
    case r: Row => r.toSeq.map(norm)
    case s: scala.collection.Seq[_] => s.map(norm)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, vv) => k -> norm(vv) }.toSeq.sortBy(_._1.toString)
    case x => x
  }

  // -- properties -----------------------------------------------------------

  test("property: StructType -> Avro schema -> StructType is identity") {
    check(Prop.forAll(structGen) { st =>
      AvroSchemaConverter.toStructType(AvroSchemaConverter.toAvroSchema(st)) == st
    })
  }

  test("property: wire codec round-trips random rows of random schemas") {
    check(Prop.forAll(structGen.flatMap(st =>
      Gen.listOfN(5, rowGen(st)).map(rs => (st, rs)))) { case (st, rows) =>
      val reg = new SchemaRegistry
      val r = reg.register("prop-value", AvroSchemaConverter.toAvroSchema(st).toString)
      val df = spark.createDataFrame(rows.asJava, st)
      val back = df
        .select(AvroFunctions.toAvroWire(struct(st.fieldNames.map(col).toSeq: _*), r).as("p"))
        .select(AvroFunctions.fromAvroRegistry(col("p"), reg, "prop-value").as("rec"))
        .select("rec.*")
        .collect()
      val expect = rows.map(x => norm(x)).toSet
      val got = back.map(x => norm(x)).toSet
      got == expect
    }, sizes = 30)
  }

  test("property: adding a defaulted field is BACKWARD-compatible; a mandatory one is not") {
    val baseGen = for {
      n <- Gen.choose(1, 4)
      types <- Gen.listOfN(n, Gen.oneOf("long", "string", "double", "boolean"))
    } yield types
    check(Prop.forAll(baseGen) { types =>
      def rec(fields: Seq[String]) =
        s"""{"type":"record","name":"r","fields":[${fields.mkString(",")}]}"""
      val base = types.zipWithIndex.map { case (t, i) => s"""{"name":"f$i","type":"$t"}""" }
      val reg = new SchemaRegistry
      reg.register("s", rec(base))
      val withDefault = reg.checkCompatibility("s",
        rec(base :+ """{"name":"extra","type":["null","long"],"default":null}"""))
      val withoutDefault = reg.checkCompatibility("s",
        rec(base :+ """{"name":"extra","type":"long"}"""))
      withDefault && !withoutDefault
    }, sizes = 30)
  }
}
