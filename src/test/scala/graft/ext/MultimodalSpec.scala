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
