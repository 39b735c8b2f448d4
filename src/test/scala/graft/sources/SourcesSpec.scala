package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.catalog.{GraftCatalog, TableDef}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("graft-rate source: deterministic modulated batches, monotonic event time") {
    val out = Files.createTempDirectory("rate-out").toString
    val ck = Files.createTempDirectory("rate-ck").toString

    def run(tag: Int): Seq[(Long, Long, Double)] = {
      val q = spark.readStream.format("graft-rate")
        .option("rowsPerSecond", "10")
        .option("jitter", "2")
        .option("periodSeconds", "10")
        .option("seed", "7")
        .option("advancePerBatchSeconds", "5") // logical clock: deterministic
        .option("startTimestamp", "0")
        .load()
        .select(unix_timestamp(col("ts")).as("epoch_s"), col("seq"), col("value"))
        .writeStream.format("parquet")
        .option("path", s"$out/$tag").option("checkpointLocation", s"$ck/$tag")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      // let a few logical batches elapse
      Thread.sleep(3000)
      q.stop()
      spark.read.parquet(s"$out/$tag").as[(Long, Long, Double)].collect()
        .sortBy(_._2).toSeq
    }

    val a = run(1)
    val b = run(2)
    assert(a.nonEmpty)
    // determinism: identical (options, seq) => identical records across runs
    val common = math.min(a.size, b.size)
    assert(a.take(common) == b.take(common))
    // seq is dense from 0
    assert(a.map(_._2) == (0L until a.size.toLong))
    // event time is non-decreasing and rate-modulated (multiple records/sec)
    assert(a.map(_._1) == a.map(_._1).sorted)
    val perSecond = a.groupBy(_._1).view.mapValues(_.size).toMap
    // rate 10, amplitude 5, jitter 2 => every second's count within [0, 18]
    assert(perSecond.values.forall(n => n >= 0 && n <= 18))
  }

  test("graft-rate: logical clock is pure over durable progress — repeat calls and restarts") {
    val conf = RateConf(Map(
      "rowsPerSecond" -> "10", "advancePerBatchSeconds" -> "5", "startTimestamp" -> "0"))
    val s1 = new RateModulatedStream(conf)
    val o1 = s1.latestOffset().asInstanceOf[CountOffset]
    assert(o1.seconds == 5)
    // Spark may call latestOffset any number of times per trigger: the
    // clock must NOT advance per call (round-2 bug mode 1)
    assert(s1.latestOffset() == o1)
    s1.planInputPartitions(s1.initialOffset(), o1)
    val o2 = s1.latestOffset().asInstanceOf[CountOffset]
    assert(o2.seconds == 10 && o2.count == conf.cumulative(10))
    s1.planInputPartitions(o1, o2)
    // restart recovery: a fresh stream restores the clock from the
    // checkpointed offset log, not from lost instance state (bug mode 2:
    // a restarted query re-advanced from zero)
    val s2 = new RateModulatedStream(conf)
    s2.deserializeOffset(o2.json())
    val o3 = s2.latestOffset().asInstanceOf[CountOffset]
    assert(o3.seconds == 15 && o3.count == conf.cumulative(15))
  }

  test("graft-rate: maxRecordsPerTrigger caps batches, defers (never drops) the schedule") {
    val conf = RateConf(Map(
      "rowsPerSecond" -> "10", "jitter" -> "0", "periodSeconds" -> "0",
      "advancePerBatchSeconds" -> "5", "startTimestamp" -> "0",
      "maxRecordsPerTrigger" -> "20"))
    val st = new RateModulatedStream(conf)
    st.getDefaultReadLimit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        assert(m.maxRows == 20L)
      case other => fail(s"expected ReadMaxRows, got $other")
    }
    // uncapped schedule would emit 50 records (10/s × 5s); cap = 20,
    // logical clock wound back to the second covering the capped prefix
    val o1 = st.latestOffset(st.initialOffset(), st.getDefaultReadLimit)
      .asInstanceOf[CountOffset]
    assert(o1.count == 20 && o1.seconds == 2)
    st.planInputPartitions(CountOffset(0, 0), o1)
    // next trigger resumes from the capped point: another 20, none skipped
    val o2 = st.latestOffset(o1, st.getDefaultReadLimit).asInstanceOf[CountOffset]
    assert(o2.count == 40 && o2.seconds == 4)
    st.planInputPartitions(o1, o2)
    // lifting the limit drains the full deferred schedule
    val o3 = st.latestOffset(o2,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      .asInstanceOf[CountOffset]
    assert(o3.count == conf.cumulative(o2.seconds + 5))
  }

  test("catalog: vacuum on a compact table keeps latest-per-key at ANY retention age") {
    val dir = Files.createTempDirectory("catc").toString
    val cat = new GraftCatalog(spark)
    cat.createTable(TableDef("cgrid", s"$dir/cgrid", keyCols = Seq("k"),
      orderCol = Some("off"), cleanupPolicy = "compact", retentionMs = 1L))
    cat.append("cgrid", Seq(("k1", 1L, "old"), ("k1", 2L, "new"), ("k2", 1L, "only"))
      .toDF("k", "off", "v"))
    // nowMs far past any mtime + retention: a delete-policy table would
    // lose every file; Kafka compact semantics must keep latest-per-key
    cat.vacuum("cgrid", nowMs = System.currentTimeMillis() + 3600L * 1000)
    val rows = cat.table("cgrid").orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows == Seq(("k1", 2L, "new"), ("k2", 1L, "only")))
    // compaction swap left no temp/backup directories behind
    val siblings = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(siblings == Set("cgrid"), s"leftover swap dirs: $siblings")
  }

  test("catalog: compact recovers the log after a simulated mid-swap crash") {
    val dir = Files.createTempDirectory("catr").toString
    val cat = new GraftCatalog(spark)
    cat.createTable(TableDef("rg", s"$dir/rg", keyCols = Seq("k"),
      orderCol = Some("off"), cleanupPolicy = "compact"))
    cat.append("rg", Seq(("k1", 1L, "old"), ("k1", 2L, "new")).toDF("k", "off", "v"))
    // simulate dying between live->old and tmp->live: live gone, full log
    // parked at .compact-old, a half-written snapshot at .compact-tmp
    Files.move(java.nio.file.Paths.get(s"$dir/rg"),
      java.nio.file.Paths.get(s"$dir/rg.compact-old"))
    Files.createDirectory(java.nio.file.Paths.get(s"$dir/rg.compact-tmp"))
    val n = cat.compact("rg") // must restore the log, then compact it
    assert(n == 1)
    val rows = cat.table("rg").collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(rows == Seq(("k1", "new")))
    // vacuum on a data-less table is a no-op, not an error
    cat.createTable(TableDef("emptyc", s"$dir/none", keyCols = Seq("k"),
      orderCol = Some("off"), cleanupPolicy = "compact"))
    assert(cat.vacuum("emptyc") == 0)
    // createViews skips the data-less table instead of failing the batch
    assert(cat.createViews().toSet == Set("rg"))
  }

  test("appendValidated gates writes on registry compatibility") {
    import graft.registry.{IncompatibleSchemaException, SchemaRegistry}
    val dir = Files.createTempDirectory("val").toString
    val cat = new GraftCatalog(spark)
    val reg = new SchemaRegistry
    cat.createTable(TableDef("acc", s"$dir/acc"))
    // first write registers v1
    cat.appendValidated("acc", Seq((1L, "alice")).toDF("id", "name"), reg, "acc-value")
    assert(reg.versions("acc-value") == Seq(1))
    // widened batch (extra nullable column) is BACKWARD-compatible -> v2
    cat.appendValidated("acc",
      Seq((2L, "bob", Some(0.5))).toDF("id", "name", "score"), reg, "acc-value")
    assert(reg.versions("acc-value") == Seq(1, 2))
    // dropping a column is BACKWARD-compatible in Avro semantics (narrower
    // readers skip writer fields) -> accepted as v3
    cat.appendValidated("acc", Seq(Tuple1(3L)).toDF("id"), reg, "acc-value")
    assert(reg.versions("acc-value") == Seq(1, 2, 3))
    // a REQUIRED (non-nullable, no-default) new field breaks old data:
    // rejected, nothing written
    val before = spark.read.parquet(s"$dir/acc").count()
    intercept[IncompatibleSchemaException] {
      cat.appendValidated("acc", Seq((4L, 40L)).toDF("id", "age"), reg, "acc-value")
    }
    assert(spark.read.parquet(s"$dir/acc").count() == before)
  }

  test("incremental poll: only new rows per poll, offset survives restart") {
    val dir = Files.createTempDirectory("inc").toString
    val offsets = s"$dir/offsets.txt"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").write.parquet(s"$dir/t")

    val poll1 = new IncrementalPoll(() => spark.read.parquet(s"$dir/t"), "id", offsets)
    val batch1 = poll1.pollCommitted()
    assert(batch1.count() == 3 && poll1.lastOffset.contains(3L))

    // no new data -> empty batch, offset unchanged
    val (batch2, hwm2) = poll1.poll()
    assert(batch2.count() == 0 && hwm2.contains(3L))

    // new rows arrive; a NEW instance (restart) resumes from the file
    Seq((4L, "d"), (5L, "e")).toDF("id", "v").write.mode("append").parquet(s"$dir/t")
    val poll2 = new IncrementalPoll(() => spark.read.parquet(s"$dir/t"), "id", offsets)
    val batch3 = poll2.pollCommitted()
    assert(batch3.select("id").as[Long].collect().sorted.toSeq == Seq(4L, 5L))
    assert(poll2.lastOffset.contains(5L))
  }

  test("catalog: DDL, physical options, compact table reads latest-by-key") {
    val dir = Files.createTempDirectory("cat").toString
    val catFile = s"$dir/catalog.tsv"
    val cat = new GraftCatalog(spark, Some(catFile))

    cat.createTable(TableDef("events_log", s"$dir/events", partitions = 2, compression = "gzip"))
    cat.createTable(TableDef("grid", s"$dir/grid", keyCols = Seq("k"), orderCol = Some("off"),
      cleanupPolicy = "compact"))

    cat.append("events_log", Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
    cat.append("grid", Seq(("k1", 1L, "old"), ("k1", 2L, "new"), ("k2", 1L, "only"))
      .toDF("k", "off", "v"))

    assert(cat.table("events_log").count() == 2)
    val compacted = cat.table("grid").orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(compacted == Seq(("k1", 2L, "new"), ("k2", 1L, "only")))

    // physical write policy is honored: gzip parquet part files
    val eventFiles = new java.io.File(s"$dir/events").listFiles().map(_.getName)
    assert(eventFiles.exists(_.endsWith(".gz.parquet")),
      s"expected gzip parquet parts, got: ${eventFiles.mkString(",")}")

    // retention vacuum: files older than retention.ms are deleted, newer
    // segments survive (the reference's rolling-stream regime). The clock
    // is passed explicitly and derived from real file mtimes — wall-clock
    // cutoffs against sub-second retentions race with append duration.
    cat.createTable(TableDef("ephemeral", s"$dir/eph", retentionMs = 60000L))
    cat.append("ephemeral", Seq((1L, "old")).toDF("id", "v"))
    Thread.sleep(100)
    cat.append("ephemeral", Seq((2L, "new")).toDF("id", "v"))
    val mtimes = new java.io.File(s"$dir/eph").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.lastModified()).sorted
    assert(mtimes.length >= 2 && mtimes.head < mtimes.last, "need two distinct segments")
    // cutoff lands strictly between the two segments' mtimes
    val removed = cat.vacuum("ephemeral", nowMs = mtimes.head + 60000L + 1)
    assert(removed >= 1)
    val left = cat.table("ephemeral").collect().map(_.getString(1)).toSeq
    assert(left == Seq("new"))

    // write-side compaction: the log shrinks to one row per key on disk,
    // and the view is identical before/after
    val before = cat.table("grid").orderBy("k").collect().map(_.toSeq).toSeq
    val nCompacted = cat.compact("grid")
    assert(nCompacted == 2)
    val after = cat.table("grid").orderBy("k").collect().map(_.toSeq).toSeq
    assert(after == before)
    assert(spark.read.parquet(s"$dir/grid").count() == 2) // raw log = 2 rows now
    intercept[IllegalArgumentException](cat.compact("events_log")) // delete-policy table

    // SQL face: registered views carry the cleanup policy — plain SQL on a
    // compact table reads latest-per-key, same rows as cat.table("grid")
    cat.createViews()
    val viaSql = spark.sql("SELECT k, off, v FROM grid ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(viaSql == Seq(("k1", 2L, "new"), ("k2", 1L, "only")))
    assert(spark.sql("SELECT count(*) FROM events_log").head.getLong(0) == 2)

    // catalog persists across instances; drop removes
    val cat2 = new GraftCatalog(spark, Some(catFile))
    assert(cat2.listTables.map(_.name).toSet == Set("events_log", "grid", "ephemeral"))
    assert(cat2.describe("grid").get.cleanupPolicy == "compact")
    cat2.dropTable("grid")
    assert(new GraftCatalog(spark, Some(catFile)).listTables.map(_.name) == Seq("events_log", "ephemeral"))
    intercept[IllegalArgumentException](cat2.table("grid"))
  }
}
