package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class BandStoreSpec extends AnyFunSuite {

  private def tmpPath(): String = {
    val f = java.io.File.createTempFile("bandstore-spec", ".json")
    f.delete()
    f.getPath
  }

  test("derive needs MinSamples positive samples") {
    assert(BandStore.derive(Seq.empty).isEmpty)
    assert(BandStore.derive(Seq.fill(BandStore.MinSamples - 1)(0.6)).isEmpty)
    assert(BandStore.derive(Seq.fill(BandStore.MinSamples)(0.6)).isDefined)
    // non-positive / non-finite samples don't count toward the minimum
    val junk = Seq.fill(BandStore.MinSamples - 1)(0.6) ++
      Seq(0.0, -1.0, Double.NaN, Double.PositiveInfinity)
    assert(BandStore.derive(junk).isEmpty)
  }

  test("derive: band = healthy-cluster max * headroom, anchored on the min") {
    // the calibrated r18 box's shape: lucky 0.51 min, healthy cluster
    // up to 0.76, incidents at 0.82+ — incidents must NOT lift the band
    val samples = Seq(0.51, 0.56, 0.61, 0.70, 0.76, 0.82, 1.9, 3.4, 0.66, 0.58)
    val b = BandStore.derive(samples).get
    assert(b.sampleMin === 0.51)
    // cluster cutoff 0.51*1.5=0.765 keeps 0.76, drops 0.82
    assert(math.abs(b.value - 0.76 * BandStore.Headroom) < 1e-9)
    assert(b.value < 0.82) // the recorded incident floor stays flagged
    assert(b.nSamples === samples.size)
  }

  test("derive widens the spread when the healthy mode outgrows 1.5x of a lucky min") {
    // the r20 box's shape: lucky 0.42 floor, healthy mode up to ~0.85,
    // episodic incidents 1.2+. A fixed 1.5x cluster (cutoff 0.63)
    // covers under 60% of history and flags half the healthy mode;
    // the adaptive spread widens until the majority is covered, while
    // incidents stay outside the cluster and never lift the band.
    val healthyMode = Seq(0.42, 0.48, 0.52, 0.55, 0.58, 0.62, 0.66, 0.70,
      0.74, 0.78, 0.82, 0.85)
    val incidents = Seq(1.2, 1.6, 3.4, 6.5)
    val b = BandStore.derive(healthyMode ++ incidents).get
    assert(b.sampleMin === 0.42)
    // spread 2.0 → cutoff 0.84 → cluster max 0.82
    assert(math.abs(b.value - 0.82 * BandStore.Headroom) < 1e-9)
    assert(incidents.forall(_ > b.value))
  }

  test("derive self-heals from a poisoned (fully-degraded) first run") {
    val poisoned = Seq.fill(10)(2.5) // first run entirely inflated
    val healthy = Seq(0.9, 0.95, 1.0, 0.92, 0.88, 0.97, 0.91, 0.94)
    // with only the poisoned run, the band is wrong (nothing to anchor on)
    assert(BandStore.derive(poisoned).get.value > 2.0)
    // one healthy run later, the lower anchor ejects every poisoned sample
    val b = BandStore.derive(poisoned ++ healthy).get
    assert(b.sampleMin === 0.88)
    assert(b.value < 1.1)
    assert(poisoned.forall(_ > b.value))
  }

  test("load/append round-trip preserves other signatures and caps FIFO") {
    val p = tmpPath()
    try {
      assert(BandStore.load(p, "sig-a") === Seq.empty) // missing file
      BandStore.append(p, "sig-a", Seq(0.5, 0.6))
      BandStore.append(p, "sig-b", Seq(1.5))
      assert(BandStore.load(p, "sig-a") === Seq(0.5, 0.6))
      assert(BandStore.load(p, "sig-b") === Seq(1.5))
      // FIFO cap: oldest samples age out
      BandStore.append(p, "sig-a", (1 to BandStore.MaxSamples).map(_ => 0.7))
      val a = BandStore.load(p, "sig-a")
      assert(a.size === BandStore.MaxSamples)
      assert(!a.contains(0.5)) // aged out
      assert(BandStore.load(p, "sig-b") === Seq(1.5)) // untouched
    } finally new java.io.File(p).delete()
  }

  test("append drops non-finite/non-positive samples; corrupt store degrades to empty") {
    val p = tmpPath()
    try {
      BandStore.append(p, "sig-c", Seq(0.5, Double.NaN, -1.0, 0.0, 0.6))
      assert(BandStore.load(p, "sig-c") === Seq(0.5, 0.6))
      java.nio.file.Files.write(new java.io.File(p).toPath,
        "not json at all {{{".getBytes("UTF-8"))
      assert(BandStore.load(p, "sig-c") === Seq.empty)
      // appending over a corrupt store still works (starts fresh)
      BandStore.append(p, "sig-c", Seq(0.7))
      assert(BandStore.load(p, "sig-c") === Seq(0.7))
    } finally new java.io.File(p).delete()
  }

  test("signature is filesystem/JSON-safe and cpu-sensitive") {
    val s32 = BandStore.signature(32)
    val s16 = BandStore.signature(16)
    assert(s32 !== s16)
    assert(s32.forall(c => c.isLetterOrDigit || c == '.' || c == '_' || c == '-'))
  }

  test("derive stamps the spread that formed the cluster (ADVICE r20)") {
    // tight box: the 1.5x cluster already covers the majority
    val tight = Seq(0.51, 0.56, 0.61, 0.70, 0.76, 0.82, 1.9, 3.4, 0.66, 0.58)
    assert(BandStore.derive(tight).get.spread === 1.5)
    // wide box: the derivation must say it ran in wide mode, so a
    // judge reading the artifact can see a ~2x-of-floor band was in
    // force when the run certified itself
    val wide = Seq(0.42, 0.48, 0.52, 0.55, 0.58, 0.62, 0.66, 0.70,
      0.74, 0.78, 0.82, 0.85, 1.2, 1.6, 3.4, 6.5)
    assert(BandStore.derive(wide).get.spread === 2.0)
  }
}
