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
    registry.register(subject, candidate)
    append(name, df)
  }

  /** Write-side log compaction: materialize a compact table's
    * latest-by-key view back to storage, replacing the accumulated log
    * (Kafka's background compaction as an explicit operation — readers see
    * the same rows before and after, but storage and scan cost drop to one
    * row per key). Returns the compacted row count. */
  def compact(name: String): Long = {
    val t = synchronized(tables.getOrElse(name,
      throw new IllegalArgumentException(s"table '$name' not found")))
    require(t.cleanupPolicy == "compact", s"table '$name' has cleanup.policy=delete")
    val snapshot = table(name).cache()
    val n = snapshot.count() // materialize before overwriting the source
    snapshot.repartition(t.partitions)
      .write.format(t.format)
      .option("compression", t.compression)
      .mode("overwrite")
      .save(t.path)
    snapshot.unpersist()
    n
  }

  /** Enforce the table's `retention.ms` (the reference's dual regime:
    * 10-year browse retention vs size/time-bounded rolling streams):
    * data files whose modification time is older than `nowMs - retentionMs`
    * are deleted. Returns the number of files removed. At 100 TB this
    * belongs to the table format's vacuum/expire-snapshots; here it is the
    * file-level analog for plain parquet logs. */
  def vacuum(name: String, nowMs: Long = System.currentTimeMillis()): Int = {
    val t = synchronized(tables.getOrElse(name,
      throw new IllegalArgumentException(s"table '$name' not found")))
    val cutoff = nowMs - t.retentionMs
    val dir = Paths.get(t.path)
    if (!Files.exists(dir)) return 0
    val victims = Files.list(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter(p => !p.getFileName.toString.startsWith("_")) // keep commit markers
      .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
      .toSeq
    victims.foreach(Files.delete)
    victims.size
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
