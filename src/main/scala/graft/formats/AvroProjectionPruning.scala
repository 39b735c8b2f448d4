package graft.formats

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.spark.sql.catalyst.expressions.{Expression, GetStructField}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Partial-projection pushdown into Avro decoding (SURVEY.md §4 custom
  * work item 1): when a plan only reads SOME fields of a decoded record
  * (`from_avro_wire(payload).a`), the reader schema is narrowed to those
  * fields, so Avro's reader/writer resolution SKIPS the others during
  * decode instead of materializing them for Catalyst to prune afterwards.
  * On wide registry schemas this turns decode cost from O(all fields)
  * into O(projected fields) per record.
  *
  * Conservative by construction: a decode is narrowed only when every
  * occurrence inside the operator is under a `GetStructField` — a bare
  * struct reference (`SELECT rec FROM …`) disables pruning for that
  * decode. Runs to fixpoint trivially (a pruned decode has no unused
  * fields left).
  */
object AvroProjectionPruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p: Project => p.copy(projectList =
      pruneIn(p.projectList).map(_.asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]))
    case f: Filter => f.copy(condition = pruneIn(Seq(f.condition)).head)
  }

  private def pruneIn(exprs: Seq[Expression]): Seq[Expression] = {
    val used = mutable.LinkedHashMap.empty[Expression, mutable.SortedSet[Int]]
    val bare = mutable.HashSet.empty[Expression]

    def collect(e: Expression): Unit = e match {
      case GetStructField(d: AvroDecodeWire, ord, _) =>
        used.getOrElseUpdate(d.canonicalized, mutable.SortedSet.empty[Int]) += ord
        d.children.foreach(collect)
      case d: AvroDecodeWire =>
        bare += d.canonicalized
        d.children.foreach(collect)
      case other => other.children.foreach(collect)
    }
    exprs.foreach(collect)

    val rewrites: Map[Expression, (Map[Int, Int], String)] = used.toMap.collect {
      case (canon, ords) if !bare.contains(canon) =>
        canon -> (ords.toSeq.zipWithIndex.toMap, "")
    }
    if (rewrites.isEmpty) return exprs

    exprs.map(_.transformUp {
      case g @ GetStructField(d: AvroDecodeWire, ord, name)
          if rewrites.contains(d.canonicalized) =>
        val (remap, _) = rewrites(d.canonicalized)
        val reader = new Schema.Parser().parse(d.readerJson)
        // already minimal → leave untouched (fixpoint)
        if (remap.size == reader.getFields.size) g
        else {
          val kept = remap.keys.toSeq.sorted.map(reader.getFields.get(_))
          val prunedFields = kept.map(f =>
            new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal()))
          val pruned = Schema.createRecord(
            reader.getName, reader.getDoc, reader.getNamespace, reader.isError,
            prunedFields.asJava)
          GetStructField(
            AvroDecodeWire(d.child, d.schemasById, pruned.toString), remap(ord), name)
        }
    })
  }
}
