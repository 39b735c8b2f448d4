package graft.catalog

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational
import org.apache.spark.sql.functions.col

/** Table catalog with the reference's topic DDL surface (SURVEY.md §2A A6:
  * create/delete topics with partitions, cleanup.policy, retention,
  * compression — `sample-data/put.sh:11-19`, `running-ais.sh:13-21`).
  *
  * A table = a storage location plus physical policy. `cleanup.policy`
  * drives READ semantics exactly as Kafka compaction does:
  *   - `delete`  → the full log (all rows);
  *   - `compact` → latest row per key (by `orderCol`, the offset analog) —
  *     the stream-table duality's table side (`telecom_italia_grid`,
  *     SURVEY.md §1.1), evaluated as a max-ordered aggregate per key, NOT
  *     a full window sort.
  *
  * Physical options map to Spark-native equivalents: `partitions` →
  * write bucketing/repartition count, `compression` → parquet codec,
  * retention → time-travel/vacuum policy for the storage layer (recorded;
  * enforcement belongs to the table format at 100 TB).
  */
final case class TableDef(
    name: String,
    path: String,
    format: String = "parquet",
    keyCols: Seq[String] = Seq.empty,
    orderCol: Option[String] = None,
    cleanupPolicy: String = "delete",
    partitions: Int = 1,
    compression: String = "snappy",
    retentionMs: Long = 315576000000L) {
  require(cleanupPolicy == "delete" || cleanupPolicy == "compact",
    s"cleanup.policy must be delete|compact, got $cleanupPolicy")
  require(cleanupPolicy != "compact" || (keyCols.nonEmpty && orderCol.nonEmpty),
    "compact tables need keyCols and orderCol")
}

class GraftCatalog(spark: SparkSession, catalogFile: Option[String] = None) {

  private val tables = mutable.LinkedHashMap.empty[String, TableDef]
  catalogFile.filter(f => Files.exists(Paths.get(f))).foreach(loadFrom)

  def createTable(t: TableDef): Unit = synchronized {
    require(!tables.contains(t.name), s"table '${t.name}' already exists")
    tables(t.name) = t
    persist()
  }

  def dropTable(name: String): Unit = synchronized {
    tables.remove(name)
    persist()
  }

  def listTables: Seq[TableDef] = synchronized(tables.values.toSeq)
  def describe(name: String): Option[TableDef] = synchronized(tables.get(name))

  /** Read a table under its cleanup policy. */
  def table(name: String): DataFrame = {
    val t = synchronized(tables.getOrElse(name,
      throw new IllegalArgumentException(s"table '$name' not found")))
    val raw = spark.read.format(t.format).load(t.path)
    if (t.cleanupPolicy == "compact")
      Relational.latestByKey(raw, t.keyCols, Seq(col(t.orderCol.get)))
    else raw
  }

  /** Register every catalog table as a session temp view carrying its
    * cleanup policy, so plain SQL sees the same semantics as [[table]]:
    * `SELECT * FROM grid` on a compact table reads latest-per-key — the
    * stream/table duality's SQL face (the reference's browse SQL hits
    * compacted topics the same way). Views snapshot the file listing at
    * registration; call again after appends/DDL to refresh. Tables with
    * no data directory yet (created, never appended) are skipped — one
    * empty table must not break SQL access to the rest. Returns the
    * names actually registered. */
  def createViews(): Seq[String] = synchronized {
    tables.keys.toSeq.filter { n =>
      val exists = Files.exists(Paths.get(tables(n).path))
      if (exists) table(n).createOrReplaceTempView(n)
      exists
    }
  }

  /** Append rows honoring the table's physical write policy. */
  def append(name: String, df: DataFrame): Unit = {
    val t = synchronized(tables.getOrElse(name,
      throw new IllegalArgumentException(s"table '$name' not found")))
    df.repartition(t.partitions)
      .write.format(t.format)
      .option("compression", t.compression)
      .mode("append")
      .save(t.path)
  }

  /** Schema-validated append (the registry gate on the write path,
    * SURVEY §2B B3): the batch's schema, converted to Avro, must be
    * compatible with the named subject under the registry's level — i.e.
    * every registered reader can still consume rows written now. Rejects
    * with the registry's diagnostics; on success the batch schema is
    * registered as a new version if it differs. */
  def appendValidated(name: String, df: DataFrame,
      registry: graft.registry.SchemaRegistry, subject: String): Unit = {
    require(describe(name).isDefined, s"table '$name' not found")
    val candidate = graft.registry.AvroSchemaConverter
      .toAvroSchema(df.schema, name).toString
    if (!registry.checkCompatibility(subject, candidate))
      throw new graft.registry.IncompatibleSchemaException(
        s"append to '$name' rejected: batch schema is incompatible with subject '$subject'")
    // write BEFORE registering: registering first would leave a phantom
    // schema version gating future writes if the append fails midway
    append(name, df)
    registry.register(subject, candidate)
  }

  /** Write-side log compaction: materialize a compact table's
    * latest-by-key view back to storage, replacing the accumulated log
    * (Kafka's background compaction as an explicit operation — readers see
    * the same rows before and after, but storage and scan cost drop to one
    * row per key). Returns the compacted row count.
    *
    * Crash-safe: the snapshot is written to a sibling temp directory and
    * only swapped into place once fully durable. Overwriting the live path
    * directly (the round-2 shape) deletes the input before the output
    * commits — `cache()` pins blocks in memory but is NOT a durability
    * guarantee (eviction or a mid-job failure recomputes from the
    * half-deleted source and the log is gone). */
  def compact(name: String): Long = {
    val t = synchronized(tables.getOrElse(name,
      throw new IllegalArgumentException(s"table '$name' not found")))
    require(t.cleanupPolicy == "compact", s"table '$name' has cleanup.policy=delete")
    val tmp = t.path + ".compact-tmp"
    val old = t.path + ".compact-old"
    // Recovery preamble: a previous run may have died INSIDE the swap
    // window (live moved aside, replacement not yet in place). The full
    // log survives at `old`; restore it BEFORE any cleanup — deleting
    // leftovers first would destroy the only remaining copies.
    if (!Files.exists(Paths.get(t.path)) && Files.exists(Paths.get(old)))
      Files.move(Paths.get(old), Paths.get(t.path))
    deleteRecursively(Paths.get(tmp))
    deleteRecursively(Paths.get(old))
    table(name).repartition(t.partitions)
      .write.format(t.format)
      .option("compression", t.compression)
      .mode("overwrite")
      .save(tmp)
    val n = spark.read.format(t.format).load(tmp).count() // parquet-footer count of the durable snapshot
    // swap: live -> old, tmp -> live, drop old. Directory moves on one
    // filesystem are metadata renames; the source log exists (as `old`)
    // until the replacement is in place. (Object stores need the table
    // format's commit protocol instead — this is the file-level analog.)
    Files.move(Paths.get(t.path), Paths.get(old))
    try Files.move(Paths.get(tmp), Paths.get(t.path))
    catch { case e: Throwable => Files.move(Paths.get(old), Paths.get(t.path)); throw e }
    deleteRecursively(Paths.get(old))
    n
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    GraftCatalog.deleteRecursively(p)

  /** Enforce the table's `retention.ms` (the reference's dual regime:
    * 10-year browse retention vs size/time-bounded rolling streams):
    * data files whose modification time is older than `nowMs - retentionMs`
    * are deleted. Returns the number of files removed. At 100 TB this
    * belongs to the table format's vacuum/expire-snapshots; here it is the
    * file-level analog for plain parquet logs. */
  def vacuum(name: String, nowMs: Long = System.currentTimeMillis()): Int = {
    val t = synchronized(tables.getOrElse(name,
      throw new IllegalArgumentException(s"table '$name' not found")))
    // A table created but never appended has no directory yet — nothing
    // to reclaim under either policy (and compaction can't read it).
    if (!Files.exists(Paths.get(t.path))) return 0
    // Kafka retention semantics: cleanup.policy=compact keeps the latest
    // record per key INDEFINITELY — time-based retention applies only to
    // delete-policy logs. mtime deletion on a compact table (the round-2
    // behavior) would drop ALL data once the table idles past retention.
    // Vacuuming a compact table instead runs compaction: superseded
    // segments are reclaimed, the latest-per-key snapshot survives any
    // retention age.
    if (t.cleanupPolicy == "compact") {
      val before = countDataFiles(t.path)
      compact(name)
      return math.max(0, before - countDataFiles(t.path))
    }
    val cutoff = nowMs - t.retentionMs
    val dir = Paths.get(t.path)
    if (!Files.exists(dir)) return 0
    val listing = Files.list(dir)
    val victims =
      try listing.iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .filter(p => !p.getFileName.toString.startsWith("_")) // keep commit markers
        .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
        .toSeq
      finally listing.close()
    victims.foreach(Files.delete)
    victims.size
  }

  private def countDataFiles(path: String): Int = {
    val dir = Paths.get(path)
    if (!Files.exists(dir)) return 0
    val listing = Files.list(dir)
    try listing.iterator().asScala
      .count(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
    finally listing.close()
  }

  private def persist(): Unit = catalogFile.foreach { f =>
    val lines = tables.values.map { t =>
      Seq(t.name, t.path, t.format, t.keyCols.mkString(","), t.orderCol.getOrElse(""),
        t.cleanupPolicy, t.partitions.toString, t.compression, t.retentionMs.toString)
        .mkString("\t")
    }.toSeq
    Files.write(Paths.get(f), lines.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  private def loadFrom(f: String): Unit =
    Files.readAllLines(Paths.get(f)).asScala.filter(_.nonEmpty).foreach { line =>
      val a = line.split("\t", -1)
      tables(a(0)) = TableDef(a(0), a(1), a(2),
        if (a(3).isEmpty) Seq.empty else a(3).split(",").toSeq,
        if (a(4).isEmpty) None else Some(a(4)),
        a(5), a(6).toInt, a(7), a(8).toLong)
    }
}

object GraftCatalog {
  import scala.jdk.CollectionConverters._

  /** Recursive local-FS delete (topic vacuum, temp spill-dir cleanup). */
  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.iterator().asScala.toSeq.foreach(deleteRecursively)
        finally children.close()
      }
      Files.delete(p)
    }
  }
}
