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
}
