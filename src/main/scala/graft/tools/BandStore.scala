package graft.tools

/** Per-box persistence + derivation of the healthy shuffle-probe band
  * Bench's `env_degraded` gate runs on.
  *
  * Round 18 compiled the band as a constant (0.76 s) calibrated from
  * one box's healthy windows; the driver's own r18 run read probes at
  * 0.88-1.0 s — every row shipped `env_degraded` and `n_certified`
  * degenerated to 0 (VERDICT r18 item 1). The calibration itself was
  * right (that box's incidents DO start at ~0.82 s); what was wrong
  * was shipping one box's band to every box. This store keeps each
  * box's own probe history under a host/cpu signature and re-derives
  * the band from it, so a box becomes calibrated by running, not by a
  * constant travelling in the binary.
  *
  * Derivation (see [[derive]]): the all-time minimum probe median is
  * the anchor — external interference is strictly additive, so the
  * minimum over many probes across many runs is the closest sample to
  * the box's true healthy floor. Samples within [[HealthySpread]] of
  * the anchor form the healthy cluster (observed healthy spread on
  * the calibrated r18 box was 1.35-1.49x over the lucky minimum;
  * recorded incidents start at ~1.6x); the band is the cluster max
  * plus [[Headroom]]. Inflated samples from degraded windows fall
  * outside the cluster and never move the band, and a poisoned FIRST
  * run self-heals: one healthy run lowers the anchor, the old
  * inflated samples drop out of the cluster, and the cap eventually
  * ages them out of the list entirely.
  *
  * The store lives OUTSIDE the repo (default under java.io.tmpdir) on
  * purpose: a committed calibration file would travel to a different
  * box exactly like the compiled constant did.
  */
object BandStore {
  /** Healthy cluster = samples <= min * spread. The spread is
    * ADAPTIVE per box (round 20): the r18 box's healthy probes sat
    * within 1.35-1.49x of the floor, but the r20 box's healthy mode
    * spans 0.46-0.88 s over a lucky 0.42 s minimum (~2.1x) — a fixed
    * 1.5x cut that mode in half and flagged whole healthy families
    * (bench run: n_certified 61/135 with every recovery probe reading
    * 0.62-0.70 against a 0.654 band). Stalls are episodic, so a
    * MAJORITY of a box's historical probe windows are healthy; the
    * derivation picks the smallest spread in [[HealthySpreads]] whose
    * cluster covers at least [[HealthyCoverage]] of the samples — a
    * tight-spread box keeps the tight band (the r18 shape still cuts
    * at 1.5x, its 0.82 incident floor stays flagged), a wide-spread
    * box widens just enough to cover its own healthy mode, and a
    * genuinely bimodal history (poisoned first run + healthy runs)
    * falls through to the widest spread with the cluster still
    * anchored on the healthy floor. */
  val HealthySpreads = Seq(1.5, 1.75, 2.0)
  val HealthyCoverage = 0.6
  /** Back-compat alias: the tightest spread tried. */
  val HealthySpread = HealthySpreads.head
  /** Band = cluster max * this (spread allowance above the largest
    * healthy sample actually observed). */
  val Headroom = 1.05
  /** Minimum samples before a derived band is trusted (a full bench
    * run contributes ~16: start/end + per-family pre/post pairs). */
  val MinSamples = 8
  /** FIFO cap on stored samples per signature — bounds the file and
    * ages out samples from a poisoned first run or an old kernel. */
  val MaxSamples = 120

  final case class Band(value: Double, sampleMin: Double, nSamples: Int,
    spread: Double = HealthySpreads.head)

  def defaultPath: String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bench_band.json").getPath

  /** Host/cpu signature: same box + same parallelism => same band.
    * Hostname alone can collide across identical containers, but two
    * boxes indistinguishable by host/cpus/arch are the best a
    * signature can do (VERDICT r18: "persisted per host/cpu
    * signature"). */
  def signature(cpus: Int): String = {
    val host = sys.env.get("HOSTNAME").filter(_.nonEmpty).getOrElse {
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Throwable => "unknown" }
    }
    val phys = Runtime.getRuntime.availableProcessors
    sanitize(s"$host-p$phys-c$cpus-${System.getProperty("os.arch", "na")}")
  }

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '.' || c == '_' || c == '-') c else '_')

  /** Derive the healthy band from a sample set; None below
    * [[MinSamples]] or with no positive samples. */
  def derive(samples: Seq[Double]): Option[Band] = {
    val pos = samples.filter(s => s > 0 && java.lang.Double.isFinite(s))
    if (pos.size < MinSamples) None
    else {
      val m = pos.min
      val spread = HealthySpreads
        .find(sp => pos.count(_ <= m * sp).toDouble / pos.size >= HealthyCoverage)
        .getOrElse(HealthySpreads.last)
      val healthy = pos.filter(_ <= m * spread)
      // the chosen spread rides the Band (ADVICE r20): a wide-mode
      // band certifies runs up to ~2x the floor, and a judge reading
      // the artifact must be able to see when that mode was in effect
      Some(Band(healthy.max * Headroom, m, pos.size, spread))
    }
  }

  /** Stored samples for a signature; empty on missing/corrupt file
    * (a corrupt store must degrade to "uncalibrated", never throw a
    * bench run away). */
  def load(path: String, sig: String): Seq[Double] = {
    try {
      val f = new java.io.File(path)
      if (!f.isFile) return Seq.empty
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      parseEntry(txt, sig)
    } catch { case _: Throwable => Seq.empty }
  }

  /** Append this run's probe medians under the signature (FIFO cap),
    * preserving other signatures' entries. Best-effort: a failed
    * write only costs future calibration, never the current run.
    *
    * The read-merge-write runs under an exclusive [[java.nio.channels.FileLock]]
    * on a sibling `.lock` file (ADVICE r19): the tmp-file-plus-move
    * alone only prevents torn writes — two runs finishing together on
    * a shared default path would each read the old store and the
    * second move would silently discard the first run's samples. The
    * lock serializes whole read-merge-write cycles; a lock failure
    * degrades to the old unlocked best-effort behavior. */
  def append(path: String, sig: String, fresh: Seq[Double]): Unit = {
    try {
      val lockFile = new java.io.RandomAccessFile(path + ".lock", "rw")
      try {
        // tryLock in a bounded retry loop (ADVICE r20): a blocking
        // lock() stalls the run indefinitely behind a hung peer
        // holding the .lock file. ~3 s total, then fall back to the
        // documented unlocked best-effort path (worst case: one run's
        // samples lost to a concurrent merge — never a stalled run).
        def tryAcquire(): Option[java.nio.channels.FileLock] = {
          var left = 30
          var got: Option[java.nio.channels.FileLock] = None
          while (got.isEmpty && left > 0) {
            got = scala.util.Try(Option(lockFile.getChannel.tryLock()))
              .toOption.flatten
            if (got.isEmpty) { Thread.sleep(100); left -= 1 }
          }
          got
        }
        val lock = tryAcquire()
        if (lock.isEmpty)
          System.err.println(s"WARN BandStore: lock on $path.lock timed out; " +
            "appending unlocked (best-effort)")
        try appendLocked(path, sig, fresh)
        finally lock.foreach(l => scala.util.Try(l.release()))
      } finally lockFile.close()
    } catch {
      case t: Throwable =>
        System.err.println(s"WARN BandStore: failed to persist $path: $t")
    }
  }

  private def appendLocked(path: String, sig: String, fresh: Seq[Double]): Unit = {
    val f = new java.io.File(path)
    val txt = if (f.isFile)
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8") else "{}"
    val sigs = parseSigs(txt)
    val merged = (load(path, sig) ++ fresh.filter(s => s > 0 && java.lang.Double.isFinite(s)))
      .takeRight(MaxSamples)
    val entries = (sigs - sig).toSeq.sorted.map { s =>
      s""""$s":{"samples":[${parseEntry(txt, s).map(fmt).mkString(",")}]}"""
    } :+ s""""$sig":{"samples":[${merged.map(fmt).mkString(",")}]}"""
    val out = entries.mkString("{", ",", "}") + "\n"
    val tmp = new java.io.File(path + s".tmp${ProcessHandle.current().pid()}")
    java.nio.file.Files.write(tmp.toPath, out.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def fmt(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)

  private val entryRe =
    """"([A-Za-z0-9._-]+)"\s*:\s*\{\s*"samples"\s*:\s*\[([^\]]*)\]\s*\}""".r

  private def parseSigs(txt: String): Set[String] =
    entryRe.findAllMatchIn(txt).map(_.group(1)).toSet

  private def parseEntry(txt: String, sig: String): Seq[Double] =
    entryRe.findAllMatchIn(txt).find(_.group(1) == sig).map { m =>
      m.group(2).split(",").iterator.map(_.trim).filter(_.nonEmpty)
        .flatMap(s => scala.util.Try(s.toDouble).toOption).toSeq
    }.getOrElse(Seq.empty)
}
