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
  *
  * CONCURRENCY: the registries are THREAD-scoped and the unpersists are
  * REFERENCE-COUNTED. A multi-tenant service runs many sessions' queries
  * concurrently against one SparkContext (the reference serves many
  * browsing sessions at once), which exposes two cross-talk paths a
  * serial harness never sees:
  *
  *  1. A global registry would make one session's end-of-query
  *     `release()` free ANOTHER session's in-flight tracked checkpoint —
  *     whose lineage is truncated, so the victim fails with lost blocks
  *     rather than recomputing. Hence thread scope: each gate builds and
  *     materializes its plan on its calling thread, so thread scope is
  *     session scope for every harness (Verify, Bench, the soak, tests).
  *
  *  2. Spark's CacheManager dedupes persists by CANONICALIZED PLAN
  *     across sessions of one SparkContext: two workers running the
  *     same (or a shingle-sharing) gate hold ONE shared cache entry,
  *     and either worker's unpersist — end-of-query or an operator's
  *     deliberate early release — yanks it while the other is mid-query
  *     (observed as a transiently EMPTY q45 under the interleaved soak,
  *     ~1-in-3 runs before this fix). Hence the per-plan reference
  *     counts: an unpersist is DEFERRED until the last same-plan holder
  *     releases — nothing is ever uncached while any tracked query
  *     still holds it. `ConcurrentGatesSpec` pins both properties with
  *     interleaved inventories under both session-sharing models.
  */
object CacheScope {

  private val tracked = new ThreadLocal[java.util.ArrayDeque[Dataset[_]]] {
    override def initialValue(): java.util.ArrayDeque[Dataset[_]] =
      new java.util.ArrayDeque[Dataset[_]]()
  }
  private val trackedCp = new ThreadLocal[java.util.ArrayDeque[Dataset[_]]] {
    override def initialValue(): java.util.ArrayDeque[Dataset[_]] =
      new java.util.ArrayDeque[Dataset[_]]()
  }

  /** Reference counts per canonicalized plan — the key CacheManager
    * itself dedupes persisted plans on, so count scope == entry scope.
    * ConcurrentHashMap gives per-key (bin-striped) atomicity: `compute`
    * holds only the key's bin lock, so releases of UNRELATED plans never
    * serialize behind each other (ADVICE r12 — the previous global
    * monitor made every retain/track/release wait out the slowest
    * release's `recacheByCondition` dependent-plan re-compilation). */
  private val refCounts = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Integer]()

  private def keyOf(ds: Dataset[_]) = ds.queryExecution.analyzed.canonicalized

  private val warnedLegacy = new java.util.concurrent.atomic.AtomicBoolean(false)
  /** The r12 root-cause bisect toggle, checked per call (tools set it in
    * main before any release). A stray `-D` flag must not be silent: the
    * first observation logs LOUDLY, because this path re-enables a proven
    * wrong-answer concurrency window (ADVICE r12). */
  private def legacyRelease: Boolean = {
    val on = sys.props.contains("graft.cachescope.legacyRelease")
    if (on && warnedLegacy.compareAndSet(false, true))
      System.err.println("[graft] WARNING: graft.cachescope.legacyRelease is set — " +
        "DIAGNOSTIC-ONLY release path active; concurrent sessions can return " +
        "silently EMPTY results (the r12 root-caused defect). Never set in production.")
    on
  }

  // --- OPT-IN shared scope (r13) -------------------------------------------
  // Under worker isolation (the Tables scope tag) cache entries are never
  // shared, so the per-key refcount sees every consumer. Under the OPT-IN
  // shared scope (same-tenant workers adopting one tag id) that invariant
  // BREAKS: CacheManager serves worker B's gate from worker A's entry via
  // plan LOOKUP, which the refcount never sees — so A's end-of-query
  // unpersist can still land under B's live query and re-open the proven
  // silent-empty chain (reproduced in loop 1 of the first shared-scope
  // soak attempt this round: a refcount-only shared mode is NOT safe).
  // The safe contract: while ANY member of a scope is active, NO tracked
  // unpersist executes — count-zero releases are DEFERRED to a pending
  // queue that the LAST member drains on exit. Within the scope's
  // lifetime cache residency grows with the distinct frames used (block
  // eviction under pressure degrades to recompute, which is safe — only
  // entry-level unpersist triggers the dependent-recompile channel).
  private val scopeMembers = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
  private val scopePending = new java.util.concurrent.ConcurrentHashMap[
    Long, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]()
  private val threadScope = new ThreadLocal[Option[Long]] {
    override def initialValue(): Option[Long] = None
  }

  /** Join a shared release scope (called via `Tables.enterSharedScope`). */
  private[graft] def enterSharedScope(id: Long): Unit = {
    threadScope.set(Some(id))
    scopeMembers.merge(id, 1, (a, b) => a + b)
    scopePending.computeIfAbsent(id,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]())
  }

  /** Leave the scope; the LAST member out drains the deferred unpersists
    * (no member is active, so nothing can be mid-query on those entries;
    * a tenant's next scope session starts cold, which is the documented
    * price of the sharing). */
  private[graft] def exitSharedScope(): Unit = threadScope.get().foreach { id =>
    threadScope.set(None)
    val left = scopeMembers.merge(id, -1, (a, b) => a + b)
    if (left <= 0) {
      scopeMembers.remove(id)
      val q = scopePending.remove(id)
      if (q != null) {
        var ds = q.poll()
        while (ds != null) { ds.unpersist(false); ds = q.poll() }
      }
    }
  }

  /** Take a reference on a persisted plan WITHOUT enqueueing it for the
    * end-of-query release — for operator-internal frames released early
    * and explicitly via [[releaseOne]] (iterative loops' edge lists). */
  def retain[T](ds: Dataset[T]): Dataset[T] = {
    refCounts.merge(keyOf(ds), 1, (a, b) => a + b); ds
  }

  /** Drop one reference; unpersist only when the LAST same-plan holder
    * (across all threads/sessions) lets go. The unpersist happens INSIDE
    * the per-key atomic `compute`: deciding "count hit zero" and executing
    * the unpersist as separate steps would let a concurrent retain slip
    * between them and have its shared cache entry yanked mid-query
    * (ADVICE r11). Only same-key (and same-bin) operations wait: the cost
    * of holding the bin lock includes CacheManager's
    * `recacheByCondition` dependent re-compilation, not just the async
    * block-removal mark — which is exactly why the lock is per-key, not
    * global (ADVICE r12). */
  def releaseOne(ds: Dataset[_]): Unit =
    if (legacyRelease) {
      // DIAGNOSTIC ONLY (r12 root-cause bisect): the pre-r12 behavior —
      // zero-decision atomically, unpersist OUTSIDE the atomic section.
      var free = false
      refCounts.compute(keyOf(ds), (_, v) => {
        val left = (if (v == null) 0 else v.intValue) - 1
        if (left <= 0) { free = true; null } else Integer.valueOf(left)
      })
      if (free) ds.unpersist(false)
    } else threadScope.get() match {
      case Some(id) =>
        // shared scope: NEVER unpersist while the scope lives — a sibling
        // may be consuming this entry through a lookup the refcount
        // cannot see. Defer to the scope's exit drain.
        refCounts.compute(keyOf(ds), (_, v) => {
          val left = (if (v == null) 0 else v.intValue) - 1
          if (left <= 0) {
            val q = scopePending.get(id)
            if (q != null) q.add(ds) else ds.unpersist(false) // scope already drained: free now
            null
          } else Integer.valueOf(left)
        })
        ()
      case None =>
        refCounts.compute(keyOf(ds), (_, v) => {
          val left = (if (v == null) 0 else v.intValue) - 1
          if (left <= 0) { ds.unpersist(false); null } else Integer.valueOf(left)
        })
        ()
    }

  /** Register an operator-internal persisted dataset for later release
    * (by the SAME thread — see CONCURRENCY above). */
  def track[T](ds: Dataset[T]): Dataset[T] = { retain(ds); tracked.get().add(ds); ds }

  /** Early-release a frame THIS THREAD already `track`ed (iterative
    * operators free their raw edge cache once the loop-lived frames are
    * materialized): drops the reference now instead of at end-of-query,
    * and removes it from the thread's queue so the reference is never
    * double-counted. */
  def releaseEarly(ds: Dataset[_]): Unit = {
    tracked.get().remove(ds)
    releaseOne(ds)
  }

  /** Register a `localCheckpoint`'d dataset (an operator OUTPUT whose
    * blocks must survive until the caller has materialized it) for
    * release with the next same-thread [[release]]. `Dataset.unpersist`
    * cannot free these — see [[releaseLocalCheckpoint]]. */
  def trackCheckpoint[T](ds: Dataset[T]): Dataset[T] = { trackedCp.get().add(ds); ds }

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

  /** Release everything THIS THREAD tracked since its last release:
    * unpersist (non-blocking) the persisted intermediates and free the
    * blocks of tracked checkpoints. Other threads' registries are
    * untouched — their in-flight checkpoints stay alive. */
  def release(): Unit = {
    bumpGeneration()
    val t = tracked.get()
    var ds = t.poll()
    while (ds != null) {
      releaseOne(ds)
      ds = t.poll()
    }
    val tc = trackedCp.get()
    var cp = tc.poll()
    while (cp != null) {
      releaseLocalCheckpoint(cp)
      cp = tc.poll()
    }
  }

  /** Number of persists the CALLING thread has tracked and not yet
    * released. */
  def pendingCount: Int = tracked.get().size() + trackedCp.get().size()

  private val gen = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = java.lang.Long.valueOf(0L)
  }
  private[graft] def bumpGeneration(): Unit = gen.set(gen.get + 1L)

  /** The calling thread's release generation: bumped by every
    * [[release]], so operator-level memos of TRACKED frames (e.g.
    * [[graft.operators.Similarity]]'s shared IVF partition) can
    * invalidate themselves the moment the frames they hand out would be
    * unpersisted — a memo hit is only ever served within the query that
    * built it. */
  def generation: Long = gen.get
}
