package graft.operators

import graft.SparkSpec

class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("hybridSearch: both-arms doc outranks single-arm docs; misses are NULL-ranked") {
    // d1 matches the query terms AND sits next to the query vector;
    // d2 is lexical-only; d3 semantic-only; d4 retrieved by neither.
    val docs = Seq(
      (1L, "alpha beta alpha beta filler one"),
      (2L, "alpha beta alpha beta alpha beta"),
      (3L, "nothing relevant in this text"),
      (4L, "equally irrelevant body of words")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0, 0.0, 0.0)),   // the query-by-example vector
      (1L, Array(0.9, 0.1, 0.0)),
      (2L, Array(0.0, 1.0, 0.0)),
      (3L, Array(0.95, 0.05, 0.0)),
      (4L, Array(0.0, 0.0, 1.0))).toDF("vec_id", "embedding")
    val out = Hybrid.hybridSearch(docs, "doc_id", "text", Seq("alpha", "beta"),
        emb, "vec_id", "embedding", queryVecId = 0L, k = 4, kEach = 2)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getLong(3)))
    graft.CacheScope.release()
    val byId = out.map(x => x._1 -> x).toMap
    // top-2 lexical = {2 (denser), 1}; top-2 semantic (excl. query 0) = {3, 1}
    assert(byId(1L)._2 == Some(2) && byId(1L)._3 == Some(2), s"d1: ${byId(1L)}")
    assert(byId(2L)._2 == Some(1) && byId(2L)._3.isEmpty)
    assert(byId(3L)._2.isEmpty && byId(3L)._3 == Some(1))
    assert(!byId.contains(4L), "doc retrieved by neither arm must not appear")
    // d1 (rank 2 + rank 2) fuses above d2/d3 (rank 1 + nothing):
    // 2·round(1e6/62) = 32258 > round(1e6/61) = 16393
    assert(out.head._1 == 1L, s"fused order: ${out.toSeq}")
    assert(byId(1L)._4 == 2 * math.round(1e6 / 62.0))
    assert(byId(2L)._4 == math.round(1e6 / 61.0) && byId(3L)._4 == byId(2L)._4)
    // ties on rrf_micro (d2, d3) break ascending by id
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
  }
}
