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
