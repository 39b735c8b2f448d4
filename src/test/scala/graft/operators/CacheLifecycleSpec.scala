package graft.operators

import graft.{CacheScope, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The CacheScope contract, asserted: every operator that persists an
  * internal table registers it, and after the consuming action +
  * `CacheScope.release()` NOTHING persisted remains (locally-checkpointed
  * RDDs excepted — those are lineage-truncation barriers owned by the
  * ContextCleaner, released when the result goes out of scope). Without
  * this, repeated operator calls (bench repeats, scale-probe loops)
  * accumulate cached tables for the session's lifetime.
  */
class CacheLifecycleSpec extends SparkSpec {

  /** Persisted-RDD ids beyond `baseline`, excluding local checkpoints
    * (`isCheckpointed` is true once an eager localCheckpoint materializes;
    * a leaked persist is never checkpointed, so it stays visible here). */
  private def leaked(baseline: Set[Int]): Map[Int, String] =
    spark.sparkContext.getPersistentRDDs
      .filter { case (id, r) => !baseline(id) && !r.isCheckpointed }
      .map { case (id, r) => id -> r.toString }
      .toMap

  /** Run `body` (which must materialize the operator's output), then
    * release and assert no persisted RDD survived. */
  private def assertReleasedAfter(expectTracked: Boolean)(body: => Long): Unit = {
    CacheScope.release() // drop anything a previous test/suite left behind
    val baseline = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val rows = body
    assert(rows > 0, "probe query produced no rows — the assertion would be vacuous")
    if (expectTracked)
      assert(CacheScope.pendingCount > 0,
        "operator was expected to register its internal persist with CacheScope")
    CacheScope.release()
    val left = leaked(baseline)
    assert(left.isEmpty, s"persisted RDDs leaked past release(): $left")
    assert(CacheScope.pendingCount == 0)
  }

  private lazy val docs = Tables.documents(spark, sf).select("doc_id", "text")
  private lazy val emb = Tables.embeddings(spark, sf)

  test("minhashLshPairs releases its shingle table") {
    assertReleasedAfter(expectTracked = true) {
      Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.6).count()
    }
  }

  test("ngramJaccardPairs releases its shingle table") {
    assertReleasedAfter(expectTracked = true) {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.4).count()
    }
  }

  test("cosineNearDupCandidates releases its unit-vector projection") {
    assertReleasedAfter(expectTracked = true) {
      Similarity.cosineNearDupCandidates(emb, "vec_id", "embedding", 0.45).count()
    }
  }

  test("connectedComponents cleans up its own per-round caches") {
    assertReleasedAfter(expectTracked = false) {
      val edges = spark.range(1000)
        .select(col("id").as("id_a"), (col("id") - col("id") % 7).as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
      Dedup.connectedComponents(edges, "id_a", "id_b").count()
    }
  }

  test("boilerplateCoverage releases its exploded span table") {
    assertReleasedAfter(expectTracked = true) {
      TextOps.boilerplateCoverage(docs, "doc_id", "text", span = 2, minDocs = 5).count()
    }
  }

  test("sourceOverlap releases its distinct shingle table") {
    assertReleasedAfter(expectTracked = true) {
      Dedup.sourceOverlap(Tables.documents(spark, sf).select("source", "text"),
        "source", "text", n = 2).count()
    }
  }

  test("stripRepeatedSpans releases its positioned n-gram table") {
    assertReleasedAfter(expectTracked = true) {
      TextOps.stripRepeatedSpans(docs, "doc_id", "text", span = 5, minDocs = 10).count()
    }
  }

  test("ngramLmScore releases its event table") {
    assertReleasedAfter(expectTracked = true) {
      TextOps.ngramLmScore(docs, "doc_id", "text").count()
    }
  }

  test("bm25Search releases its pruned token projection") {
    assertReleasedAfter(expectTracked = true) {
      TextOps.bm25Search(docs, "doc_id", "text", Seq("spark", "table"), k = 5).count()
    }
  }

  test("sequentialPack is self-contained: pinned partitioning released before return") {
    CacheScope.release()
    val baseline = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val df = spark.range(5000).select(col("id"), (pmod(col("id"), lit(97)) + 1).as("w"))
    val packed = TextOps.sequentialPack(df, "id", "w", budget = 997L)
    // eager by contract: the pinned range partitioning is already released,
    // with NO CacheScope participation required of the caller
    assert(CacheScope.pendingCount == 0, "sequentialPack must not defer its release")
    assert(leaked(baseline).isEmpty, "sequentialPack left its pinned partitioning persisted")
    assert(packed.count() == 5000)
  }
}
