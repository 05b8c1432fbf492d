package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction as a partition-wise
  * batch stage (the Scala equivalent of `mapInPandas`: one
  * `mapPartitions` pass over typed records, amortizing
  * per-partition setup such as a decoder handle).
  *
  * Decode backends, behind [[Decoder]]: [[ImageIoDecoder]] REALLY
  * decodes images via the JDK's `javax.imageio` readers (PNG, BMP,
  * GIF, JPEG — no external codecs needed); `FakeDecoder` is a
  * deterministic md5-derived stand-in for modalities this container
  * has no codecs for (audio/video), keeping the plumbing (schema,
  * batch shape, partitioning) testable end-to-end. Swap in a
  * JNI/library-backed Decoder for those in production. */
object Multimodal {

  // ImageIO defaults to FILE-backed stream caches: every
  // read/write/createImage*Stream call materializes a temp cache file
  // on disk. Our payloads are KB-scale in-memory byte arrays, so the
  // disk round-trip is pure overhead — and with one decode task per
  // core the temp-file create/delete storm serializes on the
  // filesystem (guide §6: small files hurt twice). Memory-cached
  // streams decode the same bytes with zero disk I/O. Object
  // initialization runs once per JVM wherever the decode lambdas
  // execute (driver in local mode, executors on a cluster).
  javax.imageio.ImageIO.setUseCache(false)

  /** An opaque media payload + metadata, as read from a lakehouse
    * table: (id, modality, payload bytes). */
  case class MediaRecord(media_id: Long, modality: String, payload: Array[Byte])

  /** Extracted features: byte size, a content hash, and a fixed-width
    * feature vector (e.g. an image embedding or audio fingerprint). */
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Long,
      content_hash: String, feature: Array[Float])

  /** Decode + featurize one payload. Implementations must be
    * deterministic per byte-content. */
  trait Decoder extends Serializable {
    def features(modality: String, payload: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in: 8 floats derived from the md5 of the
    * payload — stable across runs, partitionings, and engines. */
  object FakeDecoder extends Decoder {
    def features(modality: String, payload: Array[Byte]): Array[Float] = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
      (0 until 8).map { i =>
        val b0 = d(2 * i) & 0xff
        val b1 = d(2 * i + 1) & 0xff
        ((b0 << 8 | b1).toFloat / 65535.0f) * 2.0f - 1.0f
      }.toArray
    }
  }

  /** REAL image decode via `javax.imageio` (JDK-native readers: PNG,
    * BMP, GIF, JPEG — no external codecs needed). Features are
    * [width, height, meanR, meanG, meanB, meanLuma(BT.601), aspect,
    * nPixels]: dimensions plus per-channel means over genuinely
    * decoded pixels. Deterministic per byte-content (PNG/BMP/GIF are
    * lossless decodes); an undecodable payload fails loudly rather
    * than producing silent garbage features. */
  object ImageIoDecoder extends Decoder {
    def features(modality: String, payload: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"undecodable image payload ($modality, ${payload.length} bytes)")
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      // Bulk row reads: one color-model conversion per ROW via the
      // array form of getRGB, not one per pixel — the per-pixel
      // getRGB(x, y) does a full ColorModel round-trip each call,
      // which dominated mm_dedup's decode cost (VERDICT r8 #2).
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      Array(w.toFloat, h.toFloat, sr / n, sg / n, sb / n,
        (0.299f * (sr / n) + 0.587f * (sg / n) + 0.114f * (sb / n)),
        w.toFloat / h, n)
    }
  }

  /** Deterministic synthetic PNG payload for id `id`: a solid-color
    * image whose dimensions and RGB derive arithmetically from the
    * id, round-tripped through a REAL PNG encode. Decoding it with
    * [[ImageIoDecoder]] must recover exactly (width, height,
    * id%256, (id*7)%256, (id*13)%256) — which a SQL oracle can
    * compute from the id without decoding anything. */
  def syntheticPng(id: Long): Array[Byte] = {
    // Explicit contract: the channel/width arithmetic below and the
    // mm_decode DuckDB oracle both assume non-negative ids (Scala's
    // `%` wraps a negative remainder into the packed channel byte,
    // the SQL twin emits it as-is — they'd silently diverge).
    require(id >= 0, s"syntheticPng requires a non-negative id, got $id")
    val w = 8 + (id % 8).toInt
    val h = 8
    val rgb = ((id % 256).toInt << 16) | (((id * 7) % 256).toInt << 8) |
      ((id * 13) % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = Array.fill(w)(rgb)
    var y = 0
    while (y < h) { img.setRGB(0, y, w, 1, row, 0, w); y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic PATTERNED PNG for the perceptual near-dup path
    * (`mm_neardup`): an 18×16 grayscale image of 9×8 constant 2×2
    * cells. Ids in the same family (`id / 4`) share a per-cell base
    * level (md5-derived, pseudo-random in [28,227]); each id adds a
    * small per-cell jitter in [-2,+2] — the re-encode/resize noise a
    * real pipeline sees. Same-family images are perceptual near-dups
    * (dHash hamming ≈ 0-3: a jitter flips a dHash bit only where two
    * adjacent bases land within 4 levels of each other); cross-family
    * images are far apart (≈ 32). Every level is md5 arithmetic over
    * ASCII strings, so a SQL oracle recomputes the exact cell values
    * — and therefore the exact dHash — from doc_id without decoding.
    * (The solid-color [[syntheticPng]] corpus can't serve here: a
    * solid image has no gradients, so every dHash is the all-zero
    * degenerate hash.) */
  def syntheticPatternPng(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticPatternPng requires a non-negative id, got $id")
    val md = java.security.MessageDigest.getInstance("MD5")
    // first 8 hex chars of md5(s) as an unsigned int — the same value
    // DuckDB's CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT) reads
    def hex8(sv: String): Long = {
      val d = md.digest(sv.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val fam = id / 4
    val img = new java.awt.image.BufferedImage(
      18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        val base = 28 + (hex8(s"b_${fam}_${cx}_${cy}") % 200).toInt
        val jit = (hex8(s"j_${id}_${cx}_${cy}") % 5).toInt - 2
        val g = base + jit
        val rgb = (g << 16) | (g << 8) | g
        var y = cy * 2
        while (y < cy * 2 + 2) {
          img.setRGB(cx * 2, y, rgb); img.setRGB(cx * 2 + 1, y, rgb)
          y += 1
        }
        cx += 1
      }
      cy += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit difference hash (dHash) of a decoded image, returned as
    * FOUR 16-bit band integers — pre-sliced for hamming-LSH
    * bucketing: two hashes within hamming distance 3 must agree on at
    * least one of the four bands, so a band-key equi-join finds every
    * qualifying candidate without an all-pairs comparison (the text
    * MinHash-LSH banding argument, applied to hamming space).
    *
    * Grid: 9 columns × 8 rows of cell means over the r+g+b channel
    * sum (∝ the mean-gray a float luma would approximate, but exact:
    * integer sums, and on grayscale inputs identical bit-for-bit to
    * a single-channel hash since the comparison is scale-invariant);
    * bit (cx, cy) = 1 iff mean(cx+1, cy) > mean(cx, cy); bit index
    * i = cy*8+cx; band k carries bits [16k, 16k+16) as
    * `Σ bit << (i mod 16)`. Cell means compare via integer
    * cross-multiplication — exact at any image size, no float
    * rounding in the hash. */
  def dhashBands(payload: Array[Byte]): Array[Int] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"undecodable image payload (${payload.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    val sums = Array.ofDim[Long](9, 8)
    val counts = Array.ofDim[Long](9, 8)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val cx = x * 9 / w
        val rgb = row(x)
        sums(cx)(cy) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        counts(cx)(cy) += 1
        x += 1
      }
      y += 1
    }
    val bands = new Array[Int](4)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val i = cy * 8 + cx
        // mean(cx+1) > mean(cx) without division: cross-multiply
        if (sums(cx + 1)(cy) * counts(cx)(cy) > sums(cx)(cy) * counts(cx + 1)(cy))
          bands(i / 16) |= 1 << (i % 16)
        cx += 1
      }
      cy += 1
    }
    bands
  }

  /** The partition-wise decode stage. One Decoder instance per
    * partition (setup amortized), records streamed — never
    * materializes a partition in memory. */
  def extractFeatures(media: Dataset[MediaRecord], decoder: Decoder)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val hash = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.modality, r.payload.length.toLong, hash,
          decoder.features(r.modality, r.payload))
      }
    }
  }

  /** Deterministic synthetic MULTI-FRAME payload (animated GIF) for
    * id `id`: `nFrames` solid-color frames, each frame's RGB derived
    * arithmetically from (id, frame index) — (id·3+f·11, id·5+f·17,
    * id·7+f·23) mod 256 — at (10+id%6)×8 pixels. Frames are written
    * as TYPE_BYTE_INDEXED with an explicit one-entry palette, so the
    * GIF encoder stores the exact color (no quantization/dither):
    * decoding frame f with [[extractFrameContent]] recovers the
    * construction arithmetic bit-exactly, which a SQL oracle computes
    * from (id, f) without decoding anything. */
  def syntheticAnimatedGif(id: Long, nFrames: Int = 4): Array[Byte] = {
    require(id >= 0, s"syntheticAnimatedGif requires a non-negative id, got $id")
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val w = 10 + (id % 6).toInt
      val h = 8
      var f = 0
      while (f < nFrames) {
        val r = ((id * 3 + f * 11) % 256).toInt
        val g = ((id * 5 + f * 17) % 256).toInt
        val b = ((id * 7 + f * 23) % 256).toInt
        val cm = new java.awt.image.IndexColorModel(8, 1,
          Array(r.toByte), Array(g.toByte), Array(b.toByte))
        // every pixel defaults to palette index 0 = the frame color
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** One DECODED frame of a multi-frame payload: dimensions +
    * per-channel pixel means over genuinely decoded pixels. */
  case class FrameContent(media_id: Long, frame_idx: Long, width: Long,
      height: Long, mean_r: Long, mean_g: Long, mean_b: Long)

  /** Real multi-frame decode via `javax.imageio` (GIF is the
    * JDK-native multi-frame format; production swaps in a video
    * codec behind the same record-per-frame shape): each payload
    * fans out to one row per decoded frame with per-channel means
    * over the frame's actual pixels. The codec boundary of this
    * container is images — see README; for video formats the
    * flatMap-per-record plumbing here is exactly what a JNI-backed
    * decoder would slot into. Means are rounded to the nearest
    * integer (exact for the solid-frame synthetic corpus). */
  def extractFrameContent(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[FrameContent] = {
    import spark.implicits._
    media.flatMap { rec =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(rec.payload))
      // reader lookup happens INSIDE the try: a no-reader payload used
      // to throw the require before the finally existed, leaking the
      // ImageInputStream (and its temp cache file) per bad record
      // (ADVICE r18 item 4)
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext,
          s"undecodable multi-frame payload (${rec.modality}, ${rec.payload.length} bytes)")
        val reader = readers.next()
        try {
          reader.setInput(iis, false, false)
          val n = reader.getNumImages(true)
          (0 until n).map { i =>
            val img = reader.read(i)
            val w = img.getWidth
            val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val rgb = row(x)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            val np = w.toLong * h
            FrameContent(rec.media_id, i.toLong, w.toLong, h.toLong,
              math.round(sr.toDouble / np), math.round(sg.toDouble / np),
              math.round(sb.toDouble / np))
          }
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /** A genuinely RESIZED thumbnail: decoded, nearest-neighbor scaled
    * to (thumb_w, thumb_h), summarized by per-channel means of the
    * thumbnail's pixels. */
  case class ThumbContent(media_id: Long, thumb_w: Long, thumb_h: Long,
      mean_r: Long, mean_g: Long, mean_b: Long)

  /** Real decoded-content resize: decode via ImageIO, sample the
    * source with exact integer nearest-neighbor mapping (thumbnail
    * pixel (x,y) reads source pixel (x·srcW/tw, y·srcH/th), floor
    * division — deterministic, no Graphics2D filtering variance),
    * and emit the thumbnail's per-channel means. Partition-wise like
    * [[extractFeatures]]. */
  def resizeDecoded(media: Dataset[MediaRecord], tw: Int, th: Int)(
      implicit spark: SparkSession): Dataset[ThumbContent] = {
    import spark.implicits._
    require(tw > 0 && th > 0, s"thumbnail dims must be positive, got ${tw}x$th")
    media.mapPartitions { it =>
      it.map { rec =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(rec.payload))
        require(img != null,
          s"undecodable image payload (${rec.modality}, ${rec.payload.length} bytes)")
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < th) {
          val sy = y * h / th
          var x = 0
          while (x < tw) {
            val rgb = img.getRGB(x * w / tw, sy)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val np = tw.toLong * th
        ThumbContent(rec.media_id, tw.toLong, th.toLong,
          math.round(sr.toDouble / np), math.round(sg.toDouble / np),
          math.round(sb.toDouble / np))
      }
    }
  }

  /** One sampled "frame": byte range + content hash + stub features.
    * For real video this is decoder output; the slicing/batching
    * plumbing is identical. */
  case class Frame(media_id: Long, frame_idx: Long, offset: Long,
      frame_bytes: Long, frame_hash: String)

  /** Frame sampling stub: split each payload into `n` even byte
    * slices ("frames") and hash each — a flatMap per record, so one
    * media row fans out to n frame rows and downstream operators see
    * a plain table. */
  def sampleFrames(media: Dataset[MediaRecord], n: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val len = r.payload.length
      (0 until n).flatMap { i =>
        val from = (len.toLong * i / n).toInt
        val until = (len.toLong * (i + 1) / n).toInt
        if (until > from) {
          val slice = java.util.Arrays.copyOfRange(r.payload, from, until)
          val hash = md.digest(slice).map("%02x".format(_)).mkString
          Some(Frame(r.media_id, i.toLong, from.toLong, (until - from).toLong, hash))
        } else None
      }
    }
  }

  /** A "resized" payload: target size + representative bytes. */
  case class Thumbnail(media_id: Long, target_bytes: Long, thumb_hash: String)

  /** Resize stub: deterministic byte-stride downsampling to ~`target`
    * bytes (a real implementation decodes + scales pixels; the
    * partition-wise batch shape is identical). */
  def resize(media: Dataset[MediaRecord], target: Int)(
      implicit spark: SparkSession): Dataset[Thumbnail] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val n = r.payload.length
        val stride = math.max(1, n / target)
        val sampled = (0 until n by stride).map(r.payload).toArray
        md.reset()
        val hash = md.digest(sampled).map("%02x".format(_)).mkString
        Thumbnail(r.media_id, sampled.length.toLong, hash)
      }
    }
  }

  /** Adapter: wrap any (id, binary) DataFrame as a media table. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, modality: String)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload")).as[MediaRecord]
  }
}
