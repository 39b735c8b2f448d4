package graft.operators

import graft.catalyst.SimHash64
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Near-duplicate detection over a document corpus — the LLM-training-data
  * dedup surface (MinHash+LSH, SimHash, n-gram Jaccard). Every operator
  * returns the EXACT pair set defined by its threshold (candidate
  * generation is a recall-1.0-by-construction prune, then an exact verify),
  * so results are independently checkable by a brute-force oracle.
  */
object Dedup {

  /** Word n-gram shingles of a text column, distinct, as array<string>. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    val nShingles = size(toks) - (n - 1)
    when(nShingles >= 1,
      array_distinct(transform(sequence(lit(1), nShingles),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact n-gram Jaccard near-dup pairs: all (idA < idB) document pairs
    * with `|shingles(A) ∩ shingles(B)| / |shingles(A) ∪ shingles(B)| >= minJaccard`.
    *
    * Exact algorithm with a distributed plan: inverted-index join on the
    * shared shingle (candidates = pairs sharing >= 1 shingle — any pair
    * with Jaccard > 0 appears; recall is exactly 1.0), count shared
    * shingles per pair with one aggregation, then compute Jaccard from
    * |A∩B| and the per-doc set sizes without re-joining the shingle arrays:
    * |A∪B| = |A| + |B| - |A∩B|.
    *
    * Shuffles: explode→(shingle) join, then (idA,idB) agg. No N² stage;
    * skewed (very frequent) shingles are the scale risk — `maxDocFreq`
    * drops shingles present in more than that many docs (document frequency
    * pruning; a shingle shared by thousands of docs contributes candidate
    * pairs but almost no Jaccard evidence at high thresholds).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minJaccard: Double,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val sh = docs
      .select(col(idCol).as("_id"), wordShingles(col(textCol), n).as("_sh"))
      .withColumn("_setSize", size(col("_sh")))
    val posting = sh.select(col("_id"), col("_setSize"), explode(col("_sh")).as("_g"))
    val pruned = maxDocFreq match {
      case Some(limit) =>
        val dfreq = posting.groupBy("_g").agg(count(lit(1)).as("_df"))
        posting.join(broadcast(dfreq.filter(col("_df") > limit)), Seq("_g"), "left_anti")
      case None => posting
    }
    val a = pruned.select(col("_g"), col("_id").as("id_a"), col("_setSize").as("_sa"))
    val b = pruned.select(col("_g"), col("_id").as("id_b"), col("_setSize").as("_sb"))
    a.join(b, Seq("_g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "_sa", "_sb")
      .agg(count(lit(1)).as("_shared"))
      .withColumn("jaccard",
        col("_shared").cast("double") /
          (col("_sa") + col("_sb") - col("_shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: for each of `numPerms` hash permutations, the min
    * over the shingle set of `xxhash64(permIndex, shingle)`. Internal
    * bucketing hash only — never exported (engine-specific), see
    * `Portable`. */
  def minhashSignature(shingles: Column, numPerms: Int): Column =
    array((0 until numPerms).map { p =>
      array_min(transform(shingles, s => xxhash64(lit(p), s)))
    }: _*)

  /** MinHash+LSH near-dup pairs with exact verification.
    *
    * Pipeline (shingle → minhash → band → bucket-join → exact verify):
    *   1. signature of `numPerms` minhashes per doc;
    *   2. LSH with 1-row bands: candidate pairs = docs agreeing on ANY
    *      signature position. P(miss | J) = (1-J)^numPerms — at J >= 0.6,
    *      numPerms = 32: < 2e-13, so the candidate prune loses nothing in
    *      practice while cutting the verify stage far below N²;
    *   3. exact Jaccard on candidates via shared-shingle counting (same
    *      arithmetic as [[ngramJaccardPairs]]; output is the exact pair
    *      set, not the minhash estimate).
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minJaccard: Double,
      numPerms: Int = 32): DataFrame = {
    val sh = docs
      .select(col(idCol).as("_id"), wordShingles(col(textCol), n).as("_sh"))
      .withColumn("_setSize", size(col("_sh")))
    // Signatures travel WITHOUT the shingle arrays: the ×numPerms explode
    // would otherwise multiply the array bytes through the shuffle. Arrays
    // are re-attached only to the (much smaller) deduped candidate set.
    val sig = sh.select(col("_id"),
      posexplode(minhashSignature(col("_sh"), numPerms)).as(Seq("_band", "_mh")))
    val a = sig.select(col("_band"), col("_mh"), col("_id").as("id_a"))
    val b = sig.select(col("_band"), col("_mh"), col("_id").as("id_b"))
    val cand = a.join(b, Seq("_band", "_mh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    cand
      .join(sh.select(col("_id").as("id_a"), col("_sh").as("_shA"), col("_setSize").as("_sa")), Seq("id_a"))
      .join(sh.select(col("_id").as("id_b"), col("_sh").as("_shB"), col("_setSize").as("_sb")), Seq("id_b"))
      .withColumn("_shared", size(array_intersect(col("_shA"), col("_shB"))))
      .withColumn("jaccard",
        col("_shared").cast("double") /
          (col("_sa") + col("_sb") - col("_shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: all (idA < idB) pairs with
    * hamming(simhash64(tokens A), simhash64(tokens B)) <= maxHamming.
    *
    * Candidate generation is pigeonhole-exact: the 64-bit sketch is split
    * into `maxHamming + 1` chunks; two sketches within `maxHamming` bits
    * MUST agree on at least one whole chunk, so joining on
    * (chunkIndex, chunkValue) has recall exactly 1.0. Verify = cheap
    * bit_count on the pair. One explode (×(h+1)) + one equi-join shuffle.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int): DataFrame = {
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks
    val sh = docs.select(
      col(idCol).as("_id"),
      SimHash64(TextFunctions.tokens(col(textCol))).as("_h"))
    val chunks = sh.select(col("_id"), col("_h"),
      posexplode(array((0 until nChunks).map { c =>
        // chunk c = bits [c*chunkBits, (c+1)*chunkBits) (last chunk takes the remainder)
        val hi = if (c == nChunks - 1) 64 else (c + 1) * chunkBits
        val width = hi - c * chunkBits
        val mask = if (width == 64) -1L else (1L << width) - 1L
        shiftrightunsigned(col("_h"), c * chunkBits).bitwiseAND(lit(mask))
      }: _*)).as(Seq("_chunk", "_cv")))
    val a = chunks.select(col("_chunk"), col("_cv"), col("_id").as("id_a"), col("_h").as("_ha"))
    val b = chunks.select(col("_chunk"), col("_cv"), col("_id").as("id_b"), col("_h").as("_hb"))
    a.join(b, Seq("_chunk", "_cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).cast("int").as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }
}
