package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens: full coverage, correct overlap, short docs yield one chunk") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens
      (2L, "only four tokens here"),                   // < window
      (3L, (1 to 40).map(i => s"u$i").mkString(" ")))  // exactly window
      .toDF("doc_id", "text")
    val chunks = TextOps.chunkTokens(docs, "doc_id", "text", window = 40, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val byDoc = chunks.groupBy(_._1)
    // doc 1: nChunks = 1 + ceil((100-40)/30) = 3; starts 0,30,60 cover
    // tokens 1-40, 31-70, 61-100 — full coverage, last window full
    assert(byDoc(1L).sortBy(_._2).map(_._3).toSeq == Seq(40, 40, 40))
    // chunk k starts at token 30k+1
    byDoc(1L).foreach { case (_, k, _, text) =>
      assert(text.split(" ").head == s"t${30 * k + 1}")
    }
    // consecutive chunks overlap by exactly 10 tokens
    val c0 = byDoc(1L).find(_._2 == 0).get._4.split(" ")
    val c1 = byDoc(1L).find(_._2 == 1).get._4.split(" ")
    assert(c0.takeRight(10).toSeq == c1.take(10).toSeq)
    assert(byDoc(2L).map(x => (x._2, x._3)).toSeq == Seq((0, 4)))
    assert(byDoc(3L).map(x => (x._2, x._3)).toSeq == Seq((0, 40)))
    // every token of doc 1 appears in some chunk (coverage)
    val covered = byDoc(1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"t$i").toSet)
  }

  test("sequentialPack: distributed prefix sum equals the single-partition ground truth") {
    // weights chosen so packs straddle partition boundaries; 997 is not a
    // power of two (exercises the exact floor-division path)
    val rows = (1 to 1000).map(i => (i.toLong, (i * 37 % 250 + 1).toLong))
    val df = rows.toDF("doc_id", "w").repartition(13) // scrambled input partitioning
    val packed = TextOps.sequentialPack(df, "doc_id", "w", budget = 997L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.length == 1000)
    // ground truth: sequential scan in id order
    var cum = 0L
    val truth = rows.sortBy(_._1).map { case (id, w) =>
      val pack = cum / 997L; cum += w; (id, w, pack)
    }
    assert(packed.sortBy(_._1).toSeq == truth,
      "distributed two-phase prefix sum must equal the sequential scan")
    // packs are contiguous in id order and weights fill the budget
    val byPack = truth.groupBy(_._3)
    byPack.values.foreach { docs =>
      val ids = docs.map(_._1)
      assert(ids.max - ids.min + 1 == ids.length, "packs must be contiguous id ranges")
    }
  }

  test("redactPii: replaces and counts emails and phones, leaves clean text intact") {
    val docs = Seq(
      (1L, "write to jane.doe+spam@corp.example.com or call 555-123-4567 today"),
      (2L, "no pii in this sentence at all"),
      (3L, "two mails a@b.io c%d@e-f.org and +1 phone +44-2079-4600 wait 123-4567-8901"))
      .toDF("doc_id", "text")
    val out = TextOps.redactPii(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((1, 1, "write to [EMAIL] or call [PHONE] today")))
    assert(out(2L) == ((0, 0, "no pii in this sentence at all")))
    val (e3, p3, t3) = out(3L)
    assert(e3 == 2 && t3.contains("[EMAIL]") && !t3.contains("a@b.io"))
    assert(p3 >= 1 && t3.contains("[PHONE]"))
  }

  test("redactPii counts reconcile with redacted tokens when a phone hides inside an email") {
    val docs = Seq((1L, "reach me at 555-123-4567@corp.example.com now")).toDF("doc_id", "text")
    val r = TextOps.redactPii(docs, "doc_id", "text").collect()(0)
    val (emails, phones, clean) = (r.getInt(1), r.getInt(2), r.getString(3))
    // the email swallows the digits: one [EMAIL], zero [PHONE] — and the
    // counts must say exactly that (phones counted post-email-redaction)
    assert(clean == "reach me at [EMAIL] now")
    assert(emails == 1 && phones == 0,
      s"counts ($emails, $phones) must reconcile with the redacted text")
  }
}
