package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels every node with its component minimum") {
    // two components: a 5-node path 1-2-3-4-5 and a triangle 10-11-12
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(out(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(out(_) == 10L))
  }

  test("connectedComponents converges on a high-diameter path (39-node lineage probe)") {
    val pairs = (1L until 39L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 39L).forall(out(_) == 1L))
  }

  test("connectedComponents rounds are O(log diameter): 1000-link chain within 16 rounds") {
    // plain min-label propagation needs ~1000 rounds here; pointer jumping
    // must land it in ~log2(1000) + slack — the cap IS the assertion
    val pairs = (1L until 1000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b", maxRounds = 16)
      .as[(Long, Long)].collect().toMap
    assert(out.size == 1000 && out.values.forall(_ == 1L))
  }

  test("simhashPairs rejects degenerate maxHamming instead of going N²") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 64))
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = -1))
  }

  test("connectedComponents throws instead of returning non-converged labels") {
    val pairs = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, "id_a", "id_b", maxRounds = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
