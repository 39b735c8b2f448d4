package graft

import org.apache.spark.sql.Dataset

/** Deterministic release for operator-internal persists.
  *
  * Some operators persist an intermediate that their returned (lazy) plan
  * consumes several times — e.g. `Dedup.shingled`'s hashed-shingle table
  * (3-4 consumers) and `Similarity.cosineNearDupCandidates`' unit-vector
  * projection (sketch branch + both verify joins). The operator cannot
  * unpersist before returning (the caller hasn't run the plan yet), and
  * Spark has no result-scoped unpersist hook — so without a contract each
  * call leaks one cached table for the session's lifetime, and repeated
  * invocations (bench repeats, scale-probe loops) pile up cached tables
  * that evict each other back to recompute.
  *
  * Contract: operators `track` every internal persist; harness callers
  * (Verify, Bench, ScaleProbe, tests) call `release()` after materializing
  * a query's output. Release order is irrelevant (unpersist is idempotent
  * and cheap), and releasing early is SAFE — a dropped cache degrades to
  * recompute, never to wrong answers (every tracked table is a
  * deterministic projection; the one case where recompute could change
  * results — `Relational.distributedPrefixSum`'s sampled range
  * partitioning, shared by sequentialPack / concurrencySweep /
  * paretoClasses — is self-contained: persist → eager materialize →
  * unpersist inside the helper and never tracked here).
  */
object CacheScope {

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
  private val trackedCp = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Register an operator-internal persisted dataset for later release. */
  def track[T](ds: Dataset[T]): Dataset[T] = { tracked.add(ds); ds }

  /** Register a `localCheckpoint`'d dataset (an operator OUTPUT whose
    * blocks must survive until the caller has materialized it) for
    * release with the next [[release]]. `Dataset.unpersist` cannot free
    * these — see [[releaseLocalCheckpoint]]. */
  def trackCheckpoint[T](ds: Dataset[T]): Dataset[T] = { trackedCp.add(ds); ds }

  /** Free the RDD blocks behind a `localCheckpoint`'d dataset NOW.
    *
    * A local checkpoint persists at the RDD level; `Dataset.unpersist`
    * consults only the SQL CacheManager, which never saw it — so calling
    * `unpersist()` on a checkpointed dataset is a silent no-op and every
    * round of an iterative loop would leak one materialized copy until
    * driver GC + ContextCleaner get around to it. This walks the plan's
    * `LogicalRDD` leaves and unpersists the checkpointed RDDs directly.
    *
    * SAFETY: a local checkpoint TRUNCATES lineage — dropped blocks can
    * never be recomputed — so this must only run after every consumer of
    * the checkpoint has executed. (Contrast with [[track]]'s persists,
    * where early release degrades to recompute.) */
  def releaseLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Release everything tracked since the last release: unpersist
    * (non-blocking) the persisted intermediates and free the blocks of
    * tracked checkpoints. */
  def release(): Unit = {
    var ds = tracked.poll()
    while (ds != null) {
      ds.unpersist(false)
      ds = tracked.poll()
    }
    var cp = trackedCp.poll()
    while (cp != null) {
      releaseLocalCheckpoint(cp)
      cp = trackedCp.poll()
    }
  }

  /** Number of currently-tracked (not yet released) persists. */
  def pendingCount: Int = tracked.size() + trackedCp.size()
}
