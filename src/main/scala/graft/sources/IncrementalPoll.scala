package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

/** Incremental snapshot-poll source — the reference's JDBC-source-connector
  * semantics (SURVEY.md §2A A9: `mode=incrementing,
  * incrementing.column.name=id`, offsets tracked in a file,
  * `kafka-tests.yml:218-239`): each poll returns only rows whose
  * monotonically-increasing column exceeds the last committed offset, then
  * advances the offset durably.
  *
  * The loader is any DataFrame producer (a JDBC relation, a parquet path,
  * a catalog table) — the incremental predicate `idCol > lastOffset` is
  * pushed into the scan (JDBC WHERE-clause pushdown / parquet min-max
  * pruning), so a poll over a 100 TB table reads only the new tail.
  * At-least-once on restart: the offset advances AFTER the caller's
  * `commit()`, mirroring Connect's post-delivery offset flush.
  */
class IncrementalPoll(
    load: () => DataFrame,
    idCol: String,
    offsetFile: String) {

  /** Last committed offset (None until the first commit). */
  def lastOffset: Option[Long] = {
    val p = Paths.get(offsetFile)
    if (Files.exists(p)) {
      val s = Files.readString(p).trim
      if (s.isEmpty) None else Some(s.toLong)
    } else None
  }

  /** Rows with idCol > lastOffset, plus the high-water mark of the batch
    * (commit it after delivering downstream). Empty batch → same offset. */
  def poll(): (DataFrame, Option[Long]) = {
    val base = load()
    val incremental = lastOffset match {
      case Some(off) => base.filter(col(idCol) > off)
      case None => base
    }
    val hwm = incremental.agg(max(col(idCol))).collect()(0) match {
      // numeric-width-safe: max(id) is Integer for INT columns, Long for
      // BIGINT — getLong on an Integer throws ClassCastException
      case r: Row if !r.isNullAt(0) => Some(r.get(0).asInstanceOf[Number].longValue())
      case _ => lastOffset
    }
    (incremental, hwm)
  }

  /** Durably advance the offset (call after the batch is delivered). */
  def commit(offset: Option[Long]): Unit =
    offset.foreach { o =>
      Files.writeString(Paths.get(offsetFile), o.toString,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
        StandardOpenOption.WRITE)
    }

  /** Poll-and-commit in one step for idempotent sinks. */
  def pollCommitted(): DataFrame = {
    val (df, hwm) = poll()
    val materialized = df.cache()
    materialized.count() // pin the batch before moving the offset
    commit(hwm)
    materialized
  }
}
