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

  /** The arithmetic twin of dhashBands∘syntheticPatternPng — the exact
    * computation the mm_neardup DuckDB oracle runs (cell levels from
    * md5 arithmetic, bits from adjacent-cell comparisons), never
    * touching a pixel. */
  private def dhashArith(id: Long): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex8(sv: String): Long = java.lang.Long.parseLong(
      md.digest(sv.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    val fam = id / 4
    def g(cx: Int, cy: Int): Int =
      28 + (hex8(s"b_${fam}_${cx}_${cy}") % 200).toInt +
        (hex8(s"j_${id}_${cx}_${cy}") % 5).toInt - 2
    val bands = new Array[Int](4)
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val i = cy * 8 + cx
      if (g(cx + 1, cy) > g(cx, cy)) bands(i / 16) |= 1 << (i % 16)
    }
    bands
  }

  test("dHash of the patterned PNG equals its arithmetic twin (the oracle contract)") {
    // the real path — encode → PNG decode → grid means → comparisons —
    // must recover EXACTLY the closed-form hash the SQL twin computes
    for (id <- Seq(0L, 1L, 7L, 123L, 65535L, 999999L)) {
      val real = Multimodal.dhashBands(Multimodal.syntheticPatternPng(id))
      assert(real.toSeq == dhashArith(id).toSeq, s"id=$id")
    }
  }

  test("patterned corpus has near-dup structure: families close, strangers far") {
    def hamming(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val hashes = (0L until 16L).map(id =>
      id -> Multimodal.dhashBands(Multimodal.syntheticPatternPng(id))).toMap
    // same family (id/4): jitter flips a bit only on borderline
    // adjacent-base cells — distances stay small
    val within = for (f <- 0 until 4; i <- 0 until 4; j <- i + 1 until 4)
      yield hamming(hashes(f * 4L + i), hashes(f * 4L + j))
    assert(within.max <= 8, s"within-family distances: $within")
    // different families: independent base patterns — far apart
    val across = for (i <- 0 until 4) yield hamming(hashes(i.toLong), hashes(i + 4L))
    assert(across.min >= 16, s"cross-family distances: $across")
    // the banding guarantee: hamming ≤ 3 ⇒ at least one 16-bit band
    // agrees exactly (3 flips can touch at most 3 of 4 bands)
    for ((ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
         && hamming(ha, hb) <= 3)
      assert(ha.zip(hb).exists { case (x, y) => x == y }, s"pair $ia-$ib")
  }

  test("dHash is perceptual: re-encode invariant, noise-local, content-sensitive") {
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def hamming(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    // a deterministic 36x32 gradient-ish "photo"
    def photo(perturb: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 36) {
        val g0 = (x * 5 + (y / 4) * 23 + ((x * 7 + y * 3) % 13) * 6) % 200 + 20
        val g = math.max(0, math.min(255, g0 + perturb(x, y)))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val base = Multimodal.dhashBands(png(photo((_, _) => 0)))
    // (1) losslessly re-encoding identical pixels cannot move the hash
    // (PNG bytes differ run to run of an encoder, pixels don't)
    val reEncoded = {
      val decoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png(photo((_, _) => 0))))
      Multimodal.dhashBands(png(decoded))
    }
    assert(hamming(base, reEncoded) == 0)
    // (2) small per-pixel noise moves the hash a little, not a lot
    val noisy = Multimodal.dhashBands(png(photo((x, y) => ((x * 31 + y * 17) % 3) - 1)))
    assert(hamming(base, noisy) <= 8, s"noise moved ${hamming(base, noisy)} bits")
    // (3) genuinely different content (independent pattern, not a
    // perturbation of the same gradient) is far away
    val otherImg = new java.awt.image.BufferedImage(
      36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 36) {
      val g = (x * 37 + y * 53 + (x * y) % 41 * 7) % 256
      otherImg.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val other = Multimodal.dhashBands(png(otherImg))
    assert(hamming(base, other) >= 16, s"only ${hamming(base, other)} bits apart")
  }

  test("dHash cell means use cross-multiplied integer comparison (unequal cells)") {
    // a 5x4 image: 9-column grid cells have unequal pixel counts, so
    // a sum-vs-sum comparison would be wrong — build an image where
    // mean increases left-to-right while raw sums do not
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5) {
      val gLvl = 50 + x * 40 // strictly increasing by column
      img.setRGB(x, y, (gLvl << 16) | (gLvl << 8) | gLvl)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bands = Multimodal.dhashBands(bos.toByteArray)
    // monotone gradient: every adjacent-cell comparison with a
    // nonempty right neighbor where means differ must order by x;
    // the exact bit pattern is decode-derived — just assert no band
    // is degenerate all-zero AND the hash is deterministic
    assert(bands.toSeq == Multimodal.dhashBands(bos.toByteArray).toSeq)
    assert(bands.exists(_ != 0), bands.toSeq.toString)
  }

  test("syntheticAnimatedGif round-trips: decoded frames recover the (id, frame) arithmetic") {
    import spark.implicits._
    implicit val sp = spark
    val ids = Seq(0L, 5L, 37L, 255L, 9999L)
    val media = ids.toDS().repartition(2).map(id =>
      Multimodal.MediaRecord(id, "image/gif", Multimodal.syntheticAnimatedGif(id)))
    val out = Multimodal.extractFrameContent(media).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    assert(out.length == ids.length * 4)
    for (f <- out) {
      val (id, k) = (f.media_id, f.frame_idx)
      assert(f.width == 10 + id % 6 && f.height == 8, s"$id/$k dims")
      assert(f.mean_r == (id * 3 + k * 11) % 256, s"$id/$k r")
      assert(f.mean_g == (id * 5 + k * 17) % 256, s"$id/$k g")
      assert(f.mean_b == (id * 7 + k * 23) % 256, s"$id/$k b")
    }
    // frames genuinely differ: decode reads per-frame pixels, not
    // payload-level metadata
    val byId = out.groupBy(_.media_id)
    assert(byId.values.forall(fs => fs.map(f => (f.mean_r, f.mean_g, f.mean_b)).distinct.length == 4))
  }

  test("resizeDecoded: exact nearest-neighbor downscale of a gradient image") {
    import spark.implicits._
    implicit val sp = spark
    // 4x2 gradient: thumbnail (2x1) must read source pixels (0,0) and
    // (2,0) by floor mapping — means not representable by metadata
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, ((x * 60) << 16) | ((y * 100) << 8) | (x * 10 + y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val payload = bos.toByteArray
    val media = Seq(1L).toDS().map(id =>
      Multimodal.MediaRecord(id, "image/png", payload))
    val t = Multimodal.resizeDecoded(media, 2, 1).collect().head
    assert(t.thumb_w == 2 && t.thumb_h == 1)
    assert(t.mean_r == 60)  // (0 + 120) / 2
    assert(t.mean_g == 0)   // both sampled pixels are row y=0
    assert(t.mean_b == 10)  // (0 + 20) / 2
    // solid source: thumbnail means equal the source color exactly
    val solid = Seq(12345L).toDS().map(id =>
      Multimodal.MediaRecord(id, "image/png", Multimodal.syntheticPng(id)))
    val st = Multimodal.resizeDecoded(solid, 4, 4).collect().head
    assert(st.mean_r == 12345L % 256 && st.mean_g == (12345L * 7) % 256 &&
      st.mean_b == (12345L * 13) % 256)
  }
}
