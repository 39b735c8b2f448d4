package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def queriesSubset: DataFrame =
    Tables.embeddings(spark, sf).filter(col("vec_id") % 100 === 0)

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val brute = topkSet(Similarity.bruteForceTopK(
    Tables.embeddings(spark, sf), queriesSubset, "vec_id", "embedding", k = 5))

  test("LSH top-k recall vs brute force: sane at default knobs, rises with more bands") {
    def recallAt(bands: Int): Double = {
      val lsh = topkSet(Similarity.lshTopK(
        Tables.embeddings(spark, sf), queriesSubset, "vec_id", "embedding",
        k = 5, dim = 64, nBits = 16, bands = bands))
      (lsh & brute).size.toDouble / brute.size
    }
    val r4 = recallAt(4)
    val r16 = recallAt(16) // 1-bit bands: near-total candidate coverage
    info(f"LSH recall@5: bands=4 -> $r4%.3f, bands=16 -> $r16%.3f (${brute.size} truth pairs)")
    assert(r4 >= 0.3, f"LSH recall collapsed at default knobs: $r4%.3f")
    assert(r16 >= r4, "more bands must not lose recall")
    assert(r16 >= 0.9, f"1-bit bands should approach brute force, got $r16%.3f")
  }

  test("IVF recall rises with nprobe; probing all buckets IS brute force") {
    def recallAt(nprobe: Int): Double = {
      val ivf = topkSet(Similarity.ivfTopK(
        Tables.embeddings(spark, sf), queriesSubset, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = nprobe))
      (ivf & brute).size.toDouble / brute.size
    }
    val r4 = recallAt(4)
    val r16 = recallAt(16)
    info(f"IVF recall@5: nprobe=4 -> $r4%.3f, nprobe=16 -> $r16%.3f (${brute.size} truth pairs)")
    assert(r4 >= 0.3, f"IVF recall collapsed at default knobs: $r4%.3f")
    assert(r16 == 1.0, "nprobe == nlist scans the whole corpus: must equal brute force")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("banded near-dup candidates: recall 1.0 vs the exact pair set at gate defaults") {
    val emb = Tables.embeddings(spark, sf)
    val exact = pairSet(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45))
    val banded = pairSet(Similarity.cosineNearDupCandidates(emb, "vec_id", "embedding", 0.45))
    assert(exact.nonEmpty, "gate data must contain near-dup pairs for recall to mean anything")
    assert((banded -- exact).isEmpty,
      s"verify admits no false positives, but got ${(banded -- exact).take(5)}")
    val recall = (banded & exact).size.toDouble / exact.size
    info(f"banded-candidate recall vs exact: $recall%.4f over ${exact.size} true pairs")
    assert(recall == 1.0,
      s"q56 gate contract: band family must not miss pairs; missed ${(exact -- banded).take(5)}")
  }

  test("band candidates prune: wider bands cut candidates; narrower bands regain recall") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    // prune knob: 6-bit bands (one seed) must generate strictly fewer
    // candidates than 3-bit bands (three seeds), which in turn must stay
    // below the all-pairs count — the banding is doing SOME work even at
    // this low threshold (at >= 0.8 thresholds the gap widens sharply).
    val wide = Similarity.cosineBandCandidates(emb, "vec_id", "embedding",
      nBits = 60, bands = 10, sketchSeeds = Seq(42L)).count()
    val narrow = Similarity.cosineBandCandidates(emb, "vec_id", "embedding",
      nBits = 60, bands = 20, sketchSeeds = Seq(42L, 43L, 44L)).count()
    info(f"candidates: 6-bit x10 bands -> $wide (${wide * 100.0 / allPairs}%.1f%% of $allPairs), " +
      f"3-bit x60 bands -> $narrow (${narrow * 100.0 / allPairs}%.1f%%)")
    assert(wide < narrow, "wider bands must prune harder than narrow ones")
    assert(narrow < allPairs, "candidate set must stay below all-pairs")
  }

  test("bandBits == 64 does not collapse every band value to bucket 0 (mask overflow)") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val cand = Similarity.cosineBandCandidates(emb, "vec_id", "embedding",
      nBits = 64, bands = 1, sketchSeeds = Seq(42L))
    // with the mod-64 shift bug every pair collides (one bucket): 50*49/2
    assert(cand.count() < 50L * 49 / 2,
      "nBits=64, bands=1 must bucket by the full sketch, not send all rows to bucket 0")
  }

  test("every ANN result is a real corpus neighbor with correct rank ordering") {
    val ivf = Similarity.ivfTopK(
      Tables.embeddings(spark, sf), queriesSubset, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4)
    // ranks are 1..k, sims non-increasing per query
    val bad = ivf.groupBy("query_id").agg(
        max("rank").as("maxr"), count(lit(1)).as("n"),
        (min("sim") <= max("sim")).as("mono"))
      .filter(col("maxr") =!= col("n") || !col("mono"))
    assert(bad.count() == 0)
  }
}
