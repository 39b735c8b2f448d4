package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SqlProcessorsSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("browse: bounded SQL over registered static views") {
    val pipes = new Pipelines(Files.createTempDirectory("sqlp-ck").toString)
    val procs = new SqlProcessors(spark, pipes)
    procs.registerSource("customers_v",
      Seq((1L, "GOLD"), (2L, "SILVER"), (3L, "GOLD")).toDF("id", "tier"))
    val out = procs.browse(
      "SELECT tier, count(*) AS n FROM customers_v GROUP BY tier ORDER BY tier")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("GOLD", 2L), ("SILVER", 1L)))
  }

  test("submit: INSERT INTO … SELECT over a stream view runs continuously") {
    val pipes = new Pipelines(Files.createTempDirectory("sqlp-ck2").toString)
    val procs = new SqlProcessors(spark, pipes)
    val in = MemoryStream[(Timestamp, String, Double)]
    procs.registerSource("clicks_stream", in.toDF().toDF("ts", "page", "v"))
    procs.registerSource("pages_dim", Seq(("home", "H"), ("cart", "C")).toDF("page", "code"))

    procs.submit("clicks_enriched",
      """INSERT INTO clicks_out
         SELECT c.page, d.code, c.v FROM clicks_stream c
         LEFT JOIN pages_dim d ON c.page = d.page""")
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), "home", 1.0),
        (Timestamp.valueOf("2024-01-01 00:00:01"), "search", 2.0))
      pipes.awaitDrained("clicks_enriched")
      val rows = spark.table("clicks_out").collect()
        .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("-"), r.getDouble(2))).toSet
      assert(rows == Set(("home", "H", 1.0), ("search", "-", 2.0)))
      assert(pipes.list.exists(p => p.name == "clicks_enriched" && p.isActive))
    } finally pipes.stopAll()
  }

  test("submit rejects bounded SELECTs and non-INSERT statements") {
    val pipes = new Pipelines(Files.createTempDirectory("sqlp-ck3").toString)
    val procs = new SqlProcessors(spark, pipes)
    procs.registerSource("static_v", Seq(1, 2).toDF("x"))
    intercept[IllegalArgumentException] {
      procs.submit("p1", "INSERT INTO t SELECT x FROM static_v")
    }
    intercept[IllegalArgumentException] {
      procs.submit("p2", "SELECT 1")
    }
  }
}
