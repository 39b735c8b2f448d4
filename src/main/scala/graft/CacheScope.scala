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
  * results, `TextOps.sequentialPack`'s sampled range partitioning, is
  * self-contained: persist → eager materialize → unpersist inside the
  * operator and never tracked here).
  */
object CacheScope {

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Register an operator-internal persisted dataset for later release. */
  def track[T](ds: Dataset[T]): Dataset[T] = { tracked.add(ds); ds }

  /** Unpersist (non-blocking) everything tracked since the last release. */
  def release(): Unit = {
    var ds = tracked.poll()
    while (ds != null) {
      ds.unpersist(false)
      ds = tracked.poll()
    }
  }

  /** Number of currently-tracked (not yet released) persists. */
  def pendingCount: Int = tracked.size()
}
