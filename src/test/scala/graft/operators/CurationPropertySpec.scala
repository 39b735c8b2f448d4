package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the curation operators (q57-q59,
  * q64-q65): the laws a training pipeline silently depends on, checked
  * over randomized inputs rather than fixtures. Spark jobs per case are
  * small, so case counts are kept modest.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, cases: Int = 12): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private val wordGen: Gen[String] = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  test("chunkTokens law: chunks cover every token in order; overlap is exactly `overlap`") {
    val docGen = for {
      nTok <- Gen.choose(1, 120)
      words <- Gen.listOfN(nTok, wordGen)
      window <- Gen.choose(2, 50)
      overlap <- Gen.choose(0, window - 1)
    } yield (words, window, overlap)
    check(Prop.forAll(docGen) { case (words, window, overlap) =>
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = TextOps.chunkTokens(df, "doc_id", "text", window, overlap)
        .orderBy("chunk_idx").collect()
        .map(r => (r.getInt(1), r.getString(3).split(" ").toSeq))
      val step = window - overlap
      // every chunk k IS the slice starting at k*step (definition), chunk
      // indices are dense from 0, and the last chunk reaches the end of
      // the document (coverage)
      val slicesOk = chunks.forall { case (k, toks) =>
        toks == words.slice(k * step, math.min(k * step + window, words.length)) }
      val denseOk = chunks.map(_._1).toSeq == chunks.indices.toSeq
      val coverageOk = chunks.lastOption.exists { case (k, toks) =>
        k * step + toks.length == words.length }
      slicesOk && denseOk && coverageOk
    })
  }

  test("hashSplit law: label function is pure in the key — equal keys, equal splits; fractions respected loosely") {
    val cutsGen = for {
      a <- Gen.choose(1, 98)
      b <- Gen.choose(a + 1, 99)
    } yield Seq("x" -> a, "y" -> b, "z" -> 100)
    check(Prop.forAll(cutsGen, Gen.choose(1, 40)) { (cuts, n) =>
      val rows = (1 to 200).map(i => (i.toLong, s"key-${i % n}"))
      val out = Relational.hashSplit(rows.toDF("id", "k"), "k", cuts)
        .select("k", "split").collect().map(r => (r.getString(0), r.getString(1)))
      // same key -> same split, always
      out.groupBy(_._1).values.forall(v => v.map(_._2).distinct.length == 1)
    }, cases = 8)
  }

  test("sequentialPack law: per-pack weight <= budget unless a single row overflows; ids contiguous") {
    val gen = for {
      n <- Gen.choose(1, 150)
      weights <- Gen.listOfN(n, Gen.choose(1L, 400L))
      budget <- Gen.choose(50L, 600L)
    } yield (weights, budget)
    check(Prop.forAll(gen) { case (weights, budget) =>
      val rows = weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val packed = TextOps.sequentialPack(rows.toDF("id", "w"), "id", "w", budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val byPack = packed.groupBy(_._3)
      val contiguity = byPack.values.forall { docs =>
        val ids = docs.map(_._1); ids.max - ids.min + 1 == ids.length }
      // a pack's weight BEFORE its last row is < budget (the last row may
      // overflow: contiguous-greedy never reorders to fill gaps)
      val budgetLaw = byPack.values.forall { docs =>
        docs.sortBy(_._1).init.map(_._2).sum < budget ||
          docs.sortBy(_._1).map(_._2).sum <= budget
      }
      val idsMonotone = packed.map(_._3).toSeq == packed.map(_._3).sorted.toSeq
      contiguity && budgetLaw && idsMonotone
    }, cases = 8)
  }

  test("quantizeInt8 law: reconstruction error <= scale/2 for arbitrary vectors") {
    val vecGen = Gen.choose(2, 32).flatMap(d =>
      Gen.listOfN(d, Gen.choose(-1000, 1000).map(_ / 7.0f)))
    check(Prop.forAll(Gen.listOfN(5, vecGen)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("id", "vec")
      Embeddings.quantizeInt8(df, "id", "vec").collect().forall { r =>
        val (scale, err) = (r.getDouble(2), r.getDouble(4))
        err <= scale / 2 + 1e-9
      }
    }, cases = 8)
  }
}
