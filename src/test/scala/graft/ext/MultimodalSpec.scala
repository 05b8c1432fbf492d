package graft.ext

import graft.dedup.SparkTest
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("partition-wise feature extraction: schema, determinism, batch shape") {
    import spark.implicits._
    implicit val sp = spark
    val df = Seq((1L, "hello"), (2L, "world"), (3L, "hello"))
      .toDF("id", "payload")
    val media = Multimodal.asMedia(df.repartition(2), "id", "payload", "image/fake")
    val out = Multimodal.extractFeatures(media, Multimodal.FakeDecoder)
      .collect().sortBy(_.media_id)

    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_.modality == "image/fake"))
    assert(out.forall(_.feature.length == 8))
    assert(out.forall(f => f.feature.forall(x => x >= -1.0f && x <= 1.0f)))
    // same bytes -> same hash and features, regardless of partition
    assert(out(0).content_hash == out(2).content_hash)
    assert(out(0).feature.toSeq == out(2).feature.toSeq)
    assert(out(0).content_hash != out(1).content_hash)
    assert(out(0).n_bytes == 5L)
    // known md5("hello")
    assert(out(0).content_hash == "5d41402abc4b2a76b9719d911017c592")
  }

  test("ImageIoDecoder really decodes pixels: gradient PNG golden check") {
    // a 4x2 gradient image — per-pixel values chosen so the channel
    // means are NOT representable by any single pixel, proving the
    // decoder aggregates over genuinely decoded pixel data rather
    // than echoing metadata
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, ((x * 60) << 16) | ((y * 100) << 8) | (x * 10 + y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Multimodal.ImageIoDecoder.features("image/png", bos.toByteArray)
    assert(f(0) == 4.0f && f(1) == 2.0f) // width, height
    assert(f(2) == 90.0f)  // mean R = (0+60+120+180)/4
    assert(f(3) == 50.0f)  // mean G = (0+100)/2
    assert(f(4) == 15.5f)  // mean B = mean(x*10+y)
    assert(math.abs(f(5) - (0.299f * 90 + 0.587f * 50 + 0.114f * 15.5f)) < 1e-3)
    assert(f(6) == 2.0f && f(7) == 8.0f) // aspect, nPixels
  }

  test("syntheticPng round-trips through a real PNG encode/decode") {
    for (id <- Seq(0L, 7L, 255L, 256L, 12345L)) {
      val f = Multimodal.ImageIoDecoder.features("image/png", Multimodal.syntheticPng(id))
      assert(f(0) == (8 + id % 8).toFloat, s"id=$id width")
      assert(f(1) == 8.0f)
      assert(f(2) == (id % 256).toFloat, s"id=$id mean_r")
      assert(f(3) == ((id * 7) % 256).toFloat, s"id=$id mean_g")
      assert(f(4) == ((id * 13) % 256).toFloat, s"id=$id mean_b")
    }
  }

  test("undecodable payloads fail loudly instead of yielding garbage") {
    val ex = intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.features("image/png", "not a png".getBytes)
    }
    assert(ex.getMessage.contains("undecodable"))
  }

  test("resize stub downsamples deterministically") {
    import spark.implicits._
    implicit val sp = spark
    val media = Multimodal.asMedia(
      Seq((1L, "abcdefghij"), (2L, "ab")).toDF("id", "p"), "id", "p", "image/fake")
    val thumbs = Multimodal.resize(media, target = 5)
      .collect().sortBy(_.media_id)
    // 10 bytes, stride 2 -> 5 sampled bytes "acegi"
    assert(thumbs(0).target_bytes == 5L)
    assert(thumbs(0).thumb_hash ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("acegi".getBytes).map("%02x".format(_)).mkString)
    // shorter than target -> identity sampling
    assert(thumbs(1).target_bytes == 2L)
  }
}
