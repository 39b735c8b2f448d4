package graft.operators

import graft.SparkSpec
import javax.imageio.ImageIO

/** The image path uses a real codec (javax.imageio): these tests pin the
  * fixture-generator arithmetic and the decode/resize kernels against
  * hand-computed values, independent of the q61 gate oracle.
  */
class MultimodalSpec extends SparkSpec {

  private def decode(bytes: Array[Byte]) =
    ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  test("synthPng round-trips exact dimensions and pixels through the PNG codec") {
    // doc 0: 8x8, luma(x,y) = (5x + 3y) % 256
    val img0 = decode(Multimodal.synthPng(0L))
    assert((img0.getWidth, img0.getHeight) == (8, 8))
    assert(img0.getRaster.getSample(0, 0, 0) == 0)
    assert(img0.getRaster.getSample(1, 0, 0) == 5)
    assert(img0.getRaster.getSample(0, 1, 0) == 3)
    assert(img0.getRaster.getSample(7, 7, 0) == 56)
    // doc 10: dims (8 + 10%7, 8 + 10%5) = (11, 8); luma(0,0) = 70
    val img10 = decode(Multimodal.synthPng(10L))
    assert((img10.getWidth, img10.getHeight) == (11, 8))
    assert(img10.getRaster.getSample(0, 0, 0) == 70)
  }

  test("resizeImage: nearest-neighbor samples (x*f, y*f) with ceil(dim/f) output") {
    val rz = decode(Multimodal.resizeImage(Multimodal.synthPng(0L), 2))
    assert((rz.getWidth, rz.getHeight) == (4, 4))
    // output (x,y) = source (2x,2y): (1,1) -> luma(2,2) = 16
    assert(rz.getRaster.getSample(1, 1, 0) == Multimodal.imageLuma(0L, 2, 2))
    assert(rz.getRaster.getSample(3, 2, 0) == Multimodal.imageLuma(0L, 6, 4))
    // odd dims round up: 11x8 at factor 2 -> 6x4
    val rz10 = decode(Multimodal.resizeImage(Multimodal.synthPng(10L), 2))
    assert((rz10.getWidth, rz10.getHeight) == (6, 4))
    // factor 1 is the identity (bytes may differ post-reencode; raster must not)
    val id0 = decode(Multimodal.resizeImage(Multimodal.synthPng(0L), 1))
    val src0 = decode(Multimodal.synthPng(0L))
    for (y <- 0 until 8; x <- 0 until 8)
      assert(id0.getRaster.getSample(x, y, 0) == src0.getRaster.getSample(x, y, 0))
  }

  test("synthWav round-trips exact PCM samples through the WAV codec") {
    import spark.implicits._
    val docs = spark.range(0, 30).toDF("doc_id")
    val feats = Multimodal.decodeAudioFeatures(spark,
        Multimodal.synthAudioTable(spark, docs, "doc_id"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats.size == 30)
    (0L until 30L).foreach { id =>
      val expected = Multimodal.audioSamples(id)
      val f = feats(id)
      assert(f.sample_rate == 8000)
      assert(f.n_samples == expected.length, s"sample count wrong for doc $id")
      assert(f.peak_amp == expected.map(s => math.abs(s.toInt)).max, s"peak wrong for doc $id")
      val sumSq = expected.map(s => s.toLong * s).sum
      assert(f.mean_square == sumSq.toDouble / expected.length, s"mean square wrong for doc $id")
    }
  }

  test("decodeImageFeatures emits codec-derived stats matching the generator arithmetic") {
    import spark.implicits._
    val docs = spark.range(0, 40).toDF("doc_id")
    val feats = Multimodal.decodeImageFeatures(spark,
        Multimodal.synthImageTable(spark, docs, "doc_id"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats.size == 40)
    (0L until 40L).foreach { id =>
      val f = feats(id)
      val (w, h) = Multimodal.imageDims(id)
      assert((f.width, f.height) == (w, h), s"dims wrong for doc $id")
      val sum = (for (y <- 0 until h; x <- 0 until w) yield Multimodal.imageLuma(id, x, y)).map(_.toLong).sum
      assert(f.mean_luma == sum.toDouble / (w * h), s"mean luma wrong for doc $id")
      assert((f.rz_width, f.rz_height) == ((w + 1) / 2, (h + 1) / 2), s"resized dims wrong for doc $id")
    }
  }
}
