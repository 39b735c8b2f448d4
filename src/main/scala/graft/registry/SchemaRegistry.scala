package graft.registry

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaCompatibility}

/** Engine-local schema registry — the Spark-native re-creation of the
  * reference stack's Schema Registry surface (SURVEY.md §2B B1-B4:
  * register/version subjects, list, fetch by version, compatibility-check
  * candidate schemas, global compatibility config; behavior exercised by
  * the reference's test corpus `integration-tests/kafka-tests.yml:127-159`).
  *
  * Subjects hold ordered versions of Avro schemas with registry-assigned
  * GLOBAL ids — the id is what the wire format embeds
  * (`graft.formats.AvroCodec`), so decoding dispatches per record id
  * exactly like the reference's `kafka-avro-console-*` clients.
  *
  * Registration enforces the subject's compatibility level against prior
  * versions (BACKWARD by default, as the reference's registry config
  * check expects — `kafka-tests.yml:157-159`); `checkCompatibility` is
  * the non-mutating probe (`kafka-tests.yml:150-156`).
  *
  * Thread-safe; optionally persisted as a TSV of single-line schema JSON
  * (Avro `Schema.toString` never emits newlines).
  */
final case class RegisteredSchema(subject: String, version: Int, id: Int, schemaJson: String) {
  @transient lazy val schema: Schema = new Schema.Parser().parse(schemaJson)
}

sealed abstract class Compatibility(val name: String)
object Compatibility {
  case object None extends Compatibility("NONE")
  case object Backward extends Compatibility("BACKWARD")
  case object Forward extends Compatibility("FORWARD")
  case object Full extends Compatibility("FULL")
  case object BackwardTransitive extends Compatibility("BACKWARD_TRANSITIVE")
  case object ForwardTransitive extends Compatibility("FORWARD_TRANSITIVE")
  case object FullTransitive extends Compatibility("FULL_TRANSITIVE")
  val all: Seq[Compatibility] =
    Seq(None, Backward, Forward, Full, BackwardTransitive, ForwardTransitive, FullTransitive)
  def apply(name: String): Compatibility =
    all.find(_.name == name.toUpperCase).getOrElse(
      throw new IllegalArgumentException(s"unknown compatibility level: $name"))
}

class IncompatibleSchemaException(msg: String) extends RuntimeException(msg)

class SchemaRegistry extends Serializable {

  private val bySubject = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[RegisteredSchema]]
  private val byId = mutable.HashMap.empty[Int, RegisteredSchema]
  private var nextId = 1
  private var globalLevel: Compatibility = Compatibility.Backward
  private val subjectLevel = mutable.HashMap.empty[String, Compatibility]

  /** B4: global compatibility config (Confluent default BACKWARD). */
  def compatibilityLevel: Compatibility = synchronized(globalLevel)
  def setCompatibilityLevel(l: Compatibility): Unit = synchronized { globalLevel = l }
  def compatibilityLevel(subject: String): Compatibility =
    synchronized(subjectLevel.getOrElse(subject, globalLevel))
  def setCompatibilityLevel(subject: String, l: Compatibility): Unit =
    synchronized { subjectLevel(subject) = l }

  /** B1: register a schema under a subject. Identical (canonical) schema
    * re-registration is idempotent and returns the existing version; an
    * incompatible schema (per the subject's level) throws. */
  def register(subject: String, schemaJson: String): RegisteredSchema = synchronized {
    val parsed = new Schema.Parser().parse(schemaJson)
    val versions = bySubject.getOrElseUpdate(subject, mutable.ArrayBuffer.empty)
    versions.find(_.schema == parsed) match {
      case Some(existing) => existing
      case scala.None =>
        if (versions.nonEmpty && !isCompatible(subject, parsed))
          throw new IncompatibleSchemaException(
            s"schema is incompatible with subject '$subject' at level ${compatibilityLevel(subject).name}")
        val reg = RegisteredSchema(subject, versions.size + 1, nextId, parsed.toString)
        nextId += 1
        versions += reg
        byId(reg.id) = reg
        reg
    }
  }

  /** B2: subject / version listing and fetch. */
  def subjects: Seq[String] = synchronized(bySubject.keys.toSeq)
  def versions(subject: String): Seq[Int] =
    synchronized(bySubject.get(subject).map(_.map(_.version).toSeq).getOrElse(Seq.empty))
  def get(subject: String, version: Int): Option[RegisteredSchema] =
    synchronized(bySubject.get(subject).flatMap(_.find(_.version == version)))
  def latest(subject: String): Option[RegisteredSchema] =
    synchronized(bySubject.get(subject).flatMap(_.lastOption))
  def getById(id: Int): Option[RegisteredSchema] = synchronized(byId.get(id))

  /** Snapshot of every registered id → schema JSON (the "registry client
    * cache" shipped to executors inside decode expressions). */
  def schemasById: Map[Int, String] =
    synchronized(byId.map { case (id, r) => id -> r.schemaJson }.toMap)

  /** B3: non-mutating compatibility probe of a candidate schema against
    * the subject's history (latest, or all versions for *_TRANSITIVE). */
  def checkCompatibility(subject: String, candidateJson: String): Boolean = synchronized {
    val candidate = new Schema.Parser().parse(candidateJson)
    if (versions(subject).isEmpty) true else isCompatible(subject, candidate)
  }

  /** Field-level schema-drift report: WHAT changed between the subject's
    * latest version and a candidate — the diagnostic behind a failed (or
    * suspicious) compatibility gate. `checkCompatibility` answers yes/no;
    * this names the fields: `added` / `removed` / `type_changed` /
    * `default_changed`, with dotted paths into nested records (non-record
    * type changes are reported at the path where the types diverge; a
    * field that changed FROM a record TO a scalar is one `type_changed`,
    * not a cascade of removals). An unregistered subject reports every
    * candidate field `added`. */
  def diff(subject: String, candidateJson: String): Seq[SchemaRegistry.FieldDiff] = {
    val candidate = new Schema.Parser().parse(candidateJson)
    synchronized(latest(subject)) match {
      case None =>
        if (candidate.getType == Schema.Type.RECORD)
          candidate.getFields.asScala.map(f => SchemaRegistry.FieldDiff(
            f.name, "added", None, Some(f.schema.toString))).toSeq
        else Seq.empty
      case Some(prior) =>
        SchemaRegistry.diffSchemas(
          new Schema.Parser().parse(prior.schemaJson), candidate, prefix = "")
    }
  }

  private def canRead(reader: Schema, writer: Schema): Boolean =
    SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
      .getType == SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE

  private def isCompatible(subject: String, candidate: Schema): Boolean = {
    val history = bySubject(subject).toSeq
    val (targets, transitive) = compatibilityLevel(subject) match {
      case Compatibility.None => return true
      case Compatibility.Backward | Compatibility.Forward | Compatibility.Full =>
        (Seq(history.last), false)
      case _ => (history, true)
    }
    val _ = transitive
    targets.forall { prior =>
      compatibilityLevel(subject) match {
        case Compatibility.Backward | Compatibility.BackwardTransitive =>
          canRead(candidate, prior.schema)
        case Compatibility.Forward | Compatibility.ForwardTransitive =>
          canRead(prior.schema, candidate)
        case Compatibility.Full | Compatibility.FullTransitive =>
          canRead(candidate, prior.schema) && canRead(prior.schema, candidate)
        case Compatibility.None => true
      }
    }
  }

  /** Persist as TSV — `!`-prefixed header lines carry the global and
    * per-subject compatibility levels, then one row per registered schema
    * (subject, version, id, schemaJson; Avro's `Schema.toString` is
    * single-line JSON so the format is unambiguous). Everything `load`
    * needs to restore the registry VERBATIM is here: the wire format
    * embeds the global id, so a reload must never re-derive ids. */
  def save(path: String): Unit = synchronized {
    val headers =
      Seq(s"!global\t${globalLevel.name}") ++
        subjectLevel.toSeq.sortBy(_._1).map { case (s, l) => s"!subject\t$s\t${l.name}" }
    val lines = headers ++ bySubject.values.flatten.map { r =>
      s"${r.subject}\t${r.version}\t${r.id}\t${r.schemaJson}"
    }.toSeq
    Files.write(Paths.get(path), lines.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Internal restore: insert a persisted row with its ORIGINAL version
    * and global id, bypassing compatibility enforcement (the history was
    * already gated when first registered — re-gating on reload under a
    * different level could reject a valid saved registry, and re-assigning
    * ids would silently dispatch already-written wire frames to the wrong
    * writer schema). */
  private[registry] def restore(r: RegisteredSchema): Unit = synchronized {
    val versions = bySubject.getOrElseUpdate(r.subject, mutable.ArrayBuffer.empty)
    require(!versions.exists(_.version == r.version),
      s"duplicate version ${r.version} for subject '${r.subject}' in persisted registry")
    require(!byId.contains(r.id), s"duplicate global id ${r.id} in persisted registry")
    versions += r
    versions.sortInPlaceBy(_.version)
    byId(r.id) = r
    nextId = math.max(nextId, r.id + 1)
  }
}

object SchemaRegistry {

  /** One field-level drift finding: dotted `path`, `change` in
    * {added, removed, type_changed, default_changed}, and the before /
    * after schema (or default) rendering where applicable. */
  final case class FieldDiff(path: String, change: String,
      before: Option[String], after: Option[String])

  private[registry] def diffSchemas(prior: Schema, cand: Schema,
      prefix: String): Seq[FieldDiff] = {
    if (prior.getType == Schema.Type.RECORD && cand.getType == Schema.Type.RECORD) {
      val pf = prior.getFields.asScala.map(f => f.name -> f).toMap
      val cf = cand.getFields.asScala.map(f => f.name -> f).toMap
      def at(n: String) = if (prefix.isEmpty) n else s"$prefix.$n"
      val added = (cf.keySet -- pf.keySet).toSeq.sorted.map(n =>
        FieldDiff(at(n), "added", None, Some(cf(n).schema.toString)))
      val removed = (pf.keySet -- cf.keySet).toSeq.sorted.map(n =>
        FieldDiff(at(n), "removed", Some(pf(n).schema.toString), None))
      val common = (pf.keySet & cf.keySet).toSeq.sorted.flatMap { n =>
        val (a, b) = (pf(n), cf(n))
        val typeDiffs = diffSchemas(a.schema, b.schema, at(n))
        val defDiffs =
          if (Option(a.defaultVal) != Option(b.defaultVal))
            Seq(FieldDiff(at(n), "default_changed",
              Option(a.defaultVal).map(_.toString), Option(b.defaultVal).map(_.toString)))
          else Seq.empty
        typeDiffs ++ defDiffs
      }
      added ++ removed ++ common
    } else if (prior.toString != cand.toString) {
      // non-record (or record-vs-scalar) divergence: one finding at this path
      Seq(FieldDiff(if (prefix.isEmpty) "<root>" else prefix, "type_changed",
        Some(prior.toString), Some(cand.toString)))
    } else Seq.empty
  }

  def load(path: String): SchemaRegistry = {
    val reg = new SchemaRegistry
    Files.readAllLines(Paths.get(path)).asScala.filter(_.nonEmpty).foreach { line =>
      if (line.startsWith("!global\t")) {
        reg.setCompatibilityLevel(Compatibility(line.split("\t", 2)(1)))
      } else if (line.startsWith("!subject\t")) {
        val Array(_, subject, level) = line.split("\t", 3)
        reg.setCompatibilityLevel(subject, Compatibility(level))
      } else {
        val Array(subject, version, id, json) = line.split("\t", 4)
        reg.restore(RegisteredSchema(subject, version.toInt, id.toInt, json))
      }
    }
    reg
  }
}
