package graft.queries

import graft.core.Tables
import graft.ext.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search queries over the embeddings table. */
object AnnQueries {

  private val QueryMod = 50 // probe set: vec_id % 50 == 0
  private val ProbeIdCap = 25000 // with QueryMod: ≤500 probes at ANY sf
  private val TopK = 5
  private val CosThreshold = 0.30
  private val KmK = 10 // k-means clusters; matches the generator's label cardinality
  private val KmIters = 2 // Lloyd's rounds
  private val PqSub = 4 // PQ subspaces (64-dim → 4×16)
  private val PqK = 8 // PQ codebook size per subspace
  private val PqIters = 1 // PQ codebook Lloyd's rounds
  // IVF-PQ (the composed index, VERDICT r9 item 1): PQ trained on
  // RESIDUALS against the coarse IVF centroids — residual energy is a
  // fraction of whole-vector energy, so the same code budget spends
  // its centroids on the part of the vector the coarse quantizer
  // didn't explain (Jégou et al. 2011, "Product Quantization for
  // Nearest Neighbor Search", the IVFADC composition).
  private val IpSub = 8 // residual-PQ subspaces (64-dim → 8×8)
  private val IpK = 16 // residual codebook size per subspace
  private val IpIters = 4 // residual codebook Lloyd's rounds
  private val IpNProbe = 2 // coarse cells probed per query
  private val IpRerank = 50 // ADC shortlist re-ranked with exact distances
  // nProbe curve points for ann_recall_curve (nested by centroid
  // rank: each point is a filter over the max-nProbe candidate pass)
  private val ProbeCurve = Seq(1, 2, 4, 8)

  /** The bounded probe set every audit/search query uses: the
    * QueryMod sieve picks every 50th vector, the id cap bounds the
    * set at ≤500 probes at ANY corpus size (a recall audit whose
    * probe set grows with the corpus would silently turn the bounded
    * brute-truth pass into an all-pairs join at scale — ADVICE r9). */
  private def probeSet: org.apache.spark.sql.Column =
    col("vec_id") % QueryMod === 0 && col("vec_id") < ProbeIdCap

  /** The same probe-set predicate for the DuckDB twins. */
  private def probeSql(idCol: String = "vec_id"): String =
    s"$idCol % $QueryMod = 0 AND $idCol < $ProbeIdCap"

  /** Embeddings spread to one partition per core (Tables.spread,
    * gated no-op at production split counts): the single test-SF
    * parquet split otherwise serializes every corpus-streaming pass —
    * the brute-force truth joins, the per-round k-means distance
    * scans, the LSH bucket projections — onto one core, because a
    * broadcast join's streamed-side parallelism IS its input split
    * count (guide §2.4/§6). */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.embeddings(s, dir), "vec_id")

  /** Prepared (normalized) vectors are the shared "index" of all
    * three queries — build and cache once per session. */
  private def prep(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"ann_prepared:$dir", truncate = true) {
      Ann.prepared(emb(s, dir))
    }

  /** Prepared vectors WITH the shipped partition label — the corpus
    * side of the IVF serve path (ann_ivf / ann_recall / ann_semdedup
    * each re-joined prep to the label column per repetition; one
    * vec_id equi-join, Memo'd like every other index frame). */
  private def labeledPrep(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"ann_labeled:$dir", truncate = true) {
      prep(s, dir).join(emb(s, dir).select(col("vec_id"), col("label")),
        Seq("vec_id"))
    }

  /** Per-label component-mean centroids over the SHIPPED label column
    * — the trained half of the IVF index (train once, serve many: the
    * posexplode + groupBy centroid aggregation was re-running inside
    * every ann_ivf/ann_recall repetition; deterministic DECIMAL sums
    * make the Memo'd frame bit-identical to the inline one). */
  private def ivfCent(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"ann_ivf_cent:$dir", truncate = true) {
      Ann.centroids(emb(s, dir))
    }

  /** Exact-cosine top-k ground truth over the bounded probe set,
    * Memo'd (round 16): FOUR recall audits were each re-running the
    * same |probes|·n brute pass (~10 s apiece at sf10 — the dominant
    * cost of every audit at scale). Ground truth is the canonical
    * shared asset of a recall harness — computed once, scored against
    * by every index variant and parameter sweep — so it takes the
    * same Memo treatment as the prepared vectors and trained
    * codebooks. NOT used by ann_topk, where the brute pass IS the
    * operator under measurement. */
  private def cosTruth(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"ann_cos_truth:$dir:k$TopK", truncate = true) {
      val p = prep(s, dir)
      Ann.bruteForceTopK(p.filter(probeSet), p, TopK)
        .select("query_id", "neighbor_id")
    }

  /** Exact-L2 top-k ground truth over the bounded probe set, Memo'd —
    * the PQ-family audits rank by squared L2 (the metric ADC
    * approximates), so they share this table the way the IVF audits
    * share [[cosTruth]]. Ties broken by neighbor_id, self excluded —
    * verbatim the per-audit truth pass this replaces. */
  private def l2Truth(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"ann_l2_truth:$dir:k$TopK", truncate = true) {
      val p = prep(s, dir)
      val probes = p.filter(probeSet)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val corpus = p.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
      val exd2 = round(aggregate(
        zip_with(col("qv"), col("nv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x), 4)
      val tw = Window.partitionBy("query_id")
        .orderBy(col("d2").asc, col("neighbor_id").asc)
      broadcast(probes)
        .join(corpus, col("neighbor_id") =!= col("query_id"))
        .withColumn("d2", exd2)
        .withColumn("rk", row_number().over(tw)).filter(col("rk") <= TopK)
        .select("query_id", "neighbor_id")
    }

  /** The trained whole-vector codebook (label, dim, cval) — Memo'd
    * separately from the assignment so IVF-PQ residual consumers can
    * reuse the centroid VALUES without re-running the Lloyd's chain. */
  private def coarseCent(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"ann_kmeans_cent:$dir:k$KmK:i$KmIters", truncate = true) {
      Ann.kmeansCentroids(prep(s, dir), KmK, KmIters)
    }

  /** The converged k-means assignment is the shared intermediate of
    * the k-means queries (assignment, per-cluster audit,
    * SemDeDup-over-kmeans, IVF-PQ residuals) — materialize it once
    * per session, like the dedup pipeline table. The frame is one row
    * per vector (vec_id, cluster, d2, cluster_size): tiny relative to
    * the vectors themselves. */
  private def kmeansAssign(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"ann_kmeans:$dir:k$KmK:i$KmIters", truncate = true) {
      Ann.kmeansFromCentroids(prep(s, dir), coarseCent(s, dir))
    }

  /** Per-subspace PQ codebook over RAW vector slices — shared by
    * ann_pq (codes) and ann_pq_recall (codes + ADC LUTs), so the four
    * Lloyd's chains train once per session instead of once per
    * consumer (the r9 "42 exchanges" watch item). */
  private def pqCent(s: SparkSession, dir: String, sub: Int): DataFrame =
    graft.core.Memo.cached(s, s"ann_pq_cent:$dir:s$PqSub:k$PqK:i$PqIters:sub$sub", truncate = true) {
      val w = 64 / PqSub
      Ann.kmeansCentroids(
        prep(s, dir).select(col("vec_id"), slice(col("v"), sub * w + 1, w).as("v")),
        PqK, PqIters)
    }

  /** Coarse centroids re-assembled as vectors (label, cv: array) — k
    * rows, the broadcast side of every residual computation. */
  private def coarseCentVec(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"ann_ivfpq_centvec:$dir:k$KmK:i$KmIters", truncate = true) {
      coarseCent(s, dir).groupBy("label")
        .agg(array_sort(collect_list(struct(col("dim"), col("cval")))).as("dc"))
        .select(col("label").cast("long").as("label"),
          transform(col("dc"), _.getField("cval")).as("cv"))
    }

  /** Residual vectors (vec_id, label, rv = v − coarse centroid):
    * scan-speed — the coarse assignment is Memo'd and the k-vector
    * centroid table broadcasts, so the residual pass never shuffles
    * the corpus. */
  private def ipResid(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"ann_ivfpq_resid:$dir:k$KmK:i$KmIters", truncate = true) {
      prep(s, dir).select(col("vec_id"), col("v"))
        .join(kmeansAssign(s, dir).select(col("vec_id"),
          col("cluster").as("label")), Seq("vec_id"))
        .join(broadcast(coarseCentVec(s, dir)), Seq("label"))
        .select(col("vec_id"), col("label"),
          zip_with(col("v"), col("cv"), (a, b) => a - b).as("rv"))
    }

  /** Per-subspace residual codebook (IpK centroids over the sub-th
    * 8-dim residual slice), Memo'd with every parameter in the key. */
  private def ipCent(s: SparkSession, dir: String, sub: Int): DataFrame =
    graft.core.Memo.cached(s, s"ann_ivfpq_cent:$dir:s$IpSub:k$IpK:i$IpIters:sub$sub", truncate = true) {
      val w = 64 / IpSub
      Ann.kmeansCentroids(
        ipResid(s, dir).select(col("vec_id"), slice(col("rv"), sub * w + 1, w).as("v")),
        IpK, IpIters)
    }

  /** The full IVF-PQ index: one row per vector with its coarse cell,
    * its IpSub residual codes, and the exact summed quantization
    * error. Memo'd — ann_ivf_pq reads it and ann_ivf_pq_recall scores
    * against it. */
  private def ipIndex(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"ann_ivf_pq:$dir:s$IpSub:k$IpK:i$IpIters", truncate = true) {
      val r = ipResid(s, dir)
      val w = 64 / IpSub
      val parts = (0 until IpSub).map { sub =>
        Ann.nearestCentroid(
          r.select(col("vec_id"), slice(col("rv"), sub * w + 1, w).as("v")),
          ipCent(s, dir, sub))
          .select(col("vec_id"), col("label").cast("long").as(s"code_$sub"),
            col("d2").as(s"d2_$sub"))
      }
      val joined = parts.reduce((a, b) => a.join(b, Seq("vec_id")))
      // exact-integer readout of the summed 4-dp subspace errors
      val reconInt = (0 until IpSub).map(sub =>
        (col(s"d2_$sub").cast("decimal(28,4)") * 10000).cast("long"))
        .reduce(_ + _)
      r.select(col("vec_id"), col("label").as("coarse"))
        .join(joined, Seq("vec_id"))
        .select(col("vec_id") +: col("coarse") +:
          (0 until IpSub).map(sub => col(s"code_$sub")) :+
          (reconInt.cast("double") / 10000.0).as("recon_d2"): _*)
    }

  /** Materialize the session-shared prepared-vector index (bench
    * warm-up hook — see TextQueries.warmIndexes). */
  def warmIndexes(s: SparkSession, dir: String): Unit = {
    prep(s, dir).count()
    // ground-truth tables build here so their one-time cost lands in
    // the artifact's index_build stamp (visible, counted in total)
    // rather than inside a recall query's untimed warm rep (invisible).
    // Skip-aware (ADVICE r16): a SPARK_GRAFT_BENCH_SKIP run that
    // excludes every consumer of a truth table must not pay (and
    // stamp) its |probes|·n brute pass for nothing. Outside Bench the
    // env var is unset and both tables always build.
    val skipped = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val cosConsumers = Set("ann_recall", "ann_recall_curve")
    val l2Consumers =
      Set("ann_pq_recall", "ann_ivf_pq_recall", "ann_ivf_pq_persist_recall")
    // the truth passes and the IVF serve-path index frames are
    // independent given the prep build above — overlap them (guide
    // §2.6; measured sequential: cos 2.3 s + l2 1.4 s). labeledPrep /
    // ivfCent build here so their one-time cost lands in index_build
    // (visible, counted) rather than inside ann_ivf's untimed warm
    // rep (the memo-truth accounting rule, round 16).
    val ivfConsumers = Set("ann_ivf", "ann_recall", "ann_semdedup")
    graft.core.Par.run(Seq(
      () => if (!cosConsumers.subsetOf(skipped)) cosTruth(s, dir).count(): Unit,
      () => if (!l2Consumers.subsetOf(skipped)) l2Truth(s, dir).count(): Unit,
      () => if (!ivfConsumers.subsetOf(skipped)) labeledPrep(s, dir).count(): Unit,
      () => if (!ivfConsumers.subsetOf(skipped)) ivfCent(s, dir).count(): Unit))
  }

  /** Scratch locations of persisted IVF-PQ artifacts, keyed by
    * (testdata dir, index params) — save-once-per-JVM (VERDICT r12
    * item 7: each bench rep used to re-save + re-load, 3.4 s/rep of
    * pure artifact-write cost that no production search job pays; an
    * index is written once by the training job and only LOADED by
    * searches, so the per-rep timed path is load + serve). The
    * artifacts are deterministic functions of the key (same trained
    * index bit-for-bit), so cross-session reuse within the JVM is
    * sound. Reaped on JVM exit; a SIGKILLed run's leftovers are
    * covered by the same 2h stale sweep the streaming scratch uses
    * (RAM-backed /dev/shm leaks shrink usable memory for everything
    * after). */
  private val savedIdxDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def rmTree(f: java.io.File): Unit = graft.core.Fs.rmTree(f)

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      savedIdxDirs.values.foreach(d =>
        scala.util.Try(rmTree(new java.io.File(d))): Unit)))
  }

  /** A fresh scratch dir under /dev/shm when available (RAM-backed —
    * the artifacts are KBs and the bench must not measure root-disk
    * writeback). Before creating, reap leftovers of SIGKILLed runs:
    * same-prefix dirs older than 2h that are NOT registered by this
    * JVM (ADVICE r13: a >2h session's own live index must never be
    * swept out from under it; cache hits also touch mtime below, so
    * an in-use dir looks fresh to other JVMs' sweeps too). */
  private def freshScratchDir(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = if (java.nio.file.Files.isDirectory(shm)) {
      val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
      val mine = savedIdxDirs.values.toSet
      val kids = shm.toFile.listFiles()
      if (kids != null) kids.foreach { f =>
        if (f.getName.startsWith("graft_annidx") &&
            f.lastModified() < cutoff && !mine.contains(f.toString)) rmTree(f)
      }
      java.nio.file.Files.createTempDirectory(shm, prefix)
    } else java.nio.file.Files.createTempDirectory(prefix)
    base.toString
  }

  private def touch(dir: String): Unit =
    new java.io.File(dir).setLastModified(System.currentTimeMillis()): Unit

  private def persistedIndexDir(s: SparkSession, dir: String): String = {
    val key = s"$dir:s$IpSub:k$IpK:i$IpIters:km$KmK"
    savedIdxDirs.get(key) match {
      case Some(p) => touch(p); p
      case None => synchronized {
        savedIdxDirs.getOrElse(key, {
          val base = freshScratchDir("graft_annidx")
          // the code table is KBs at bench scale: 32 cache-partition
          // files would make every load/serve pay 32 file opens of
          // ~60 rows each (a real trainer sizes its output files; so
          // does this one — save keeps whatever parallelism the
          // caller's frame carries)
          graft.sources.AnnIndexIO.save(base, coarseCent(s, dir),
            (0 until IpSub).map(sub => ipCent(s, dir, sub)),
            ipIndex(s, dir).coalesce(8),
            coarseK = KmK, codebookK = IpK, dim = 64)
          savedIdxDirs.update(key, base)
          base
        })
      }
    }
  }

  /** Once-per-JVM MUTATION scratch for queries that exercise the
    * index take-down path (remove/compact): a physical copy of the
    * session's persisted index, plus the pristine manifest text so
    * [[resetMutationScratch]] can rewind it between bench reps.
    * VERDICT r13's weak mark: the old audit re-copied the whole
    * artifact tree EVERY rep (2.0 s median of pure file copying at
    * sf0.1 — at 100× it would copy the code table per rep, a cost no
    * production take-down batch pays). With generation-numbered
    * compaction the gen-0 code files are never touched by
    * remove/compact, so the rewind is metadata-only: restore the
    * manifest, drop tombstones and post-0 generations.
    *
    * SINGLE-EVALUATION CONTRACT (ADVICE r14): frames returned by
    * queries over this scratch (ann_ivf_pq_remove) are lazy views over
    * state the NEXT invocation rewinds — they must be fully evaluated
    * before ann_ivf_pq_remove runs again, and never concurrently with
    * it. Verify and Bench both evaluate eagerly and sequentially, and
    * the scratch is private to this object, so the contract holds by
    * construction; a caller wanting a longer-lived frame must
    * localCheckpoint it (which would put a materialization cost no
    * production take-down batch pays back into the timed path this
    * scratch exists to keep honest). */
  private def mutationScratch(s: SparkSession, dir: String): String = {
    val key = s"mut:$dir:s$IpSub:k$IpK:i$IpIters:km$KmK"
    val scratch = savedIdxDirs.get(key) match {
      case Some(p) => touch(p); p
      case None => synchronized {
        savedIdxDirs.getOrElse(key, {
          val src = java.nio.file.Paths.get(persistedIndexDir(s, dir))
          val dst = java.nio.file.Paths.get(freshScratchDir("graft_annidx_mut"))
          val stream = java.nio.file.Files.walk(src)
          try stream.forEach { p =>
            val t = dst.resolve(src.relativize(p))
            if (java.nio.file.Files.isDirectory(p)) {
              java.nio.file.Files.createDirectories(t): Unit
            } else {
              java.nio.file.Files.createDirectories(t.getParent)
              java.nio.file.Files.copy(p, t,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
            }
          } finally stream.close()
          savedIdxDirs.update(key, dst.toString)
          dst.toString
        })
      }
    }
    resetMutationScratch(s, dir, scratch)
    scratch
  }

  /** Rewind the mutation scratch to its just-copied state: gen-0
    * manifest back in place (byte-identical to the persisted
    * original's), tombstones and compaction generations gone. Cheap
    * by construction — compact writes NEW generation dirs and never
    * touches the gen-0 code files. */
  private def resetMutationScratch(s: SparkSession, dir: String,
      scratch: String): Unit = {
    val pristine = java.nio.file.Paths.get(
      persistedIndexDir(s, dir), "manifest.json")
    java.nio.file.Files.copy(pristine,
      java.nio.file.Paths.get(scratch, "manifest.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    val kids = new java.io.File(scratch).listFiles()
    if (kids != null) kids.foreach { f =>
      val n = f.getName
      if (n.startsWith("tombstones") || n.startsWith("codes_g")) rmTree(f)
    }
  }

  /** The governed LSH pair join — volume-derived plane count AND the
    * hot-bucket sorted-neighborhood cap (see [[Ann.saltedCosinePairs]])
    * — the DEFAULT candidate generator of ann_lsh_pairs /
    * ann_dedup_clusters since r15 (the r12 text-family swap, replayed:
    * fixed geometry and uncapped planes are the explicitly-named
    * audits). The count() driving the plane governor reads a Memo'd
    * cached frame; a cluster job would read table metadata. */
  /** One Memo'd scan of the bucket histogram yields every governor
    * input at once: the hottest bucket's size (drives the cap gate)
    * and the candidate-pair upper bound of the plan that gate selects
    * (drives the CC small-graph gate, VERDICT r15 item 1). Keyed by
    * (dir, plane count) — buckets depend on nothing else — so the
    * governed default and the `_governed` audit share one aggregate
    * job per session. */
  private final case class BucketStats(maxBucket: Long, pairBound: Long)
  private def bucketStats(s: SparkSession, p: DataFrame, dir: String,
      planes: Seq[Seq[Double]]): BucketStats = {
    val row = graft.core.Memo.cached(s,
      s"ann_bucketstats:$dir:p${planes.size}") {
      // triangular buckets imply C(bn,2) candidates; a bucket the cap
      // would switch to sorted-neighborhood implies ≤ bn·(window−1).
      // bn·(bn−1) is even, so the long cast after halving is exact.
      val tri = (col("bn") * (col("bn") - 1) / 2).cast("long")
      val hot = (col("bn") * (AnnNeighborWindow - 1)).cast("long")
      p.select(Ann.lshBucket(col("v"), planes).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("bn"))
        .agg(coalesce(max(col("bn")), lit(0L)).as("max_bucket"),
          coalesce(sum(tri), lit(0L)).as("pairs_uncapped"),
          coalesce(sum(when(col("bn") > AnnBucketCap, hot).otherwise(tri)),
            lit(0L)).as("pairs_capped"))
    }.head()
    val capped = row.getLong(0) > AnnBucketCap
    BucketStats(row.getLong(0), if (capped) row.getLong(2) else row.getLong(1))
  }

  private def governedPairs(s: SparkSession, dir: String,
      minCos: Double): DataFrame = governedPairsWithBound(s, dir, minCos)._1

  /** Returns the governed pair join AND its candidate-count upper
    * bound (verified pairs ⊆ candidates) for downstream CC gating. */
  private def governedPairsWithBound(s: SparkSession, dir: String,
      minCos: Double): (DataFrame, Long) = {
    val p = prep(s, dir)
    val planes = PlanesAll.take(planesFor(p.count()))
    // SIZE-GATED like the text family's band-bucket governor: on a
    // corpus whose hottest bucket already fits the cap the split is a
    // proven no-op (AnnCapGovernorSpec), so the capped plan's extra
    // scans are skipped outright — engaged only when the Memo'd
    // full-corpus bucket max shows a hot bucket exists (sf ≤ 0.1:
    // never; sf1: 23 buckets; sf10: ~1.5k). Semantics are unchanged
    // either way, so the one capped twin grades both gate outcomes.
    val stats = bucketStats(s, p, dir, planes)
    val cap = if (stats.maxBucket > AnnBucketCap) Some(AnnBucketCap) else None
    (Ann.lshPairs(p, planes, minCos,
      bucketCap = cap, window = AnnNeighborWindow), stats.pairBound)
  }

  /** Near-dup cluster assembly shared by the three ann_dedup_clusters
    * variants: verified pairs become edges, connected components merge
    * transitive near-dups, min vec_id elects the canonical vector,
    * non-edge vectors stay singletons. */
  private def dedupClusters(p: DataFrame, pairs: DataFrame,
      pairBound: Long = -1L): DataFrame = {
    val comps = graft.dedup.Cluster.connectedComponents(
      pairs.select(col("a_id").as("src"), col("b_id").as("dst")),
      edgeCountHint = pairBound)
      .withColumnRenamed("id", "vec_id")
    val w = Window.partitionBy("cluster_id")
    p.select(col("vec_id"))
      .join(comps, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col("vec_id") === col("cluster_id"))
      .orderBy("vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact cosine top-k for a BOUNDED probe set of queries (the
    // QueryMod sieve alone grows linearly with the corpus; ProbeIdCap
    // bounds it at ≤500 probes at any sf — ADVICE r9).
    "ann_topk" -> ((s, dir) => {
      val p = prep(s, dir)
      Ann.bruteForceTopK(p.filter(probeSet), p, TopK)
        .orderBy("query_id", "rk")
    }),

    // embedding-cosine near-dup pairs above a threshold, for a
    // BOUNDED probe set (≤500 probe vectors at any sf, broadcast to a
    // nested-loop scan of the corpus — O(|probe|·n), so the declared
    // suite stays runnable at any scale; unbounded all-pairs is
    // deliberately not a declared query).
    "ann_threshold_pairs" -> ((s, dir) => {
      val p = prep(s, dir)
      val a = p.filter(probeSet)
        .select(col("vec_id").as("a_id"), col("u").as("au"))
      val b = p.select(col("vec_id").as("b_id"), col("u").as("bu"))
      broadcast(a).join(b, col("a_id") < col("b_id"))
        .withColumn("cos", Ann.cosine(col("au"), col("bu")))
        .filter(col("cos") >= CosThreshold)
        .select("a_id", "b_id", "cos")
        .orderBy("a_id", "b_id")
    }),

    // sign-LSH bucketed near-dup join: one bucket per vector (vs the
    // all-pairs O(n²) of ann_threshold_pairs), exact-cosine verified.
    // GOVERNED BY DEFAULT since r15 (VERDICT r14 item 1): volume-
    // derived plane count (planesFor — expected bucket size pinned at
    // ~32 as the corpus grows) AND the hot-bucket sorted-neighborhood
    // cap (buckets over AnnBucketCap members pair rank-adjacently
    // instead of quadratically). Both governors are derived from
    // integer thresholds the DuckDB twin replays exactly, so the
    // default is oracle-gated at every sf; the fixed-6-plane
    // ungoverned geometry lives on as the _fixed audit below, and the
    // planes-only variant as the _governed audit (what does the cap
    // cost / what did the planes buy).
    "ann_lsh_pairs" -> ((s, dir) =>
      governedPairs(s, dir, minCos = 0.20).orderBy("a_id", "b_id")),

    // AUDIT: the historical fixed 6-plane, uncapped geometry — the
    // quadratic counterfactual (18× wall at 10× data, SCALE.md ANN
    // table) kept oracle-gated so the governed default's cost/recall
    // trade stays measurable against it.
    "ann_lsh_pairs_fixed" -> ((s, dir) =>
      Ann.lshPairs(prep(s, dir), Planes, minCos = 0.20)
        .orderBy("a_id", "b_id")),

    // AUDIT: volume-governed planes WITHOUT the hot-bucket cap —
    // isolates what the cap costs (pairs dropped in hot buckets) from
    // what the plane governor buys (unrelated-vector candidates never
    // generated).
    "ann_lsh_pairs_governed" -> ((s, dir) => {
      val p = prep(s, dir)
      Ann.lshPairs(p, PlanesAll.take(planesFor(p.count())), minCos = 0.20)
        .orderBy("a_id", "b_id")
    }),

    // int8 scalar quantization (4x storage reduction for embedding
    // tables): per-vector quantized checksum + reconstruction error.
    "ann_quantize" -> ((s, dir) => {
      val p = prep(s, dir)
      val q = transform(col("v"), x => round(greatest(lit(-1.0), least(lit(1.0), x)) * 127))
      p.withColumn("q", q)
        .select(col("vec_id"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x.cast("long")).as("q_sum"),
          array_min(col("q")).cast("long").as("q_min"),
          array_max(col("q")).cast("long").as("q_max"),
          round(sqrt(aggregate(zip_with(col("v"), col("q"),
            (x, qq) => (x - qq / 127.0) * (x - qq / 127.0)),
            lit(0.0), (acc, x) => acc + x)), 6).as("recon_err"))
        .orderBy("vec_id")
    }),

    // RAG-style retrieval: top-k neighbors per probe, hydrated with
    // document metadata (embeddings.vec_id aligns with
    // documents.doc_id). The k×|probes| result side is tiny, so the
    // metadata join broadcasts/AQE-shuffles like any small-to-big
    // equi-join — the retrieval pattern a vector-augmented pipeline
    // runs per batch.
    "ann_doc_topk" -> ((s, dir) => {
      val p = prep(s, dir)
      val topk = Ann.bruteForceTopK(p.filter(probeSet), p, TopK)
      val meta = Tables.documents(s, dir)
        .select(col("doc_id").as("neighbor_id"), col("lang"), col("source"))
      topk.join(meta, Seq("neighbor_id"))
        .select("query_id", "rk", "neighbor_id", "cos", "lang", "source")
        .orderBy("query_id", "rk")
    }),

    // embedding-cosine near-dup DEDUP: sign-LSH candidate pairs above
    // the cosine threshold become edges, connected components merge
    // transitive near-dups, min vec_id elects the canonical vector.
    // The full near-dup-removal composition for an embedding corpus:
    // candidates are bucket-local (never all-pairs), CC runs on the
    // verified pair set, and the final join back to ids broadcasts.
    // GOVERNED BY DEFAULT since r15: volume-derived planes + the
    // hot-bucket cap. For the workload the cap exists for — co-
    // bucketed near-dup FAMILIES — rank-adjacent pairs keep each
    // family chain-connected, so CC recovers the same clusters from
    // O(|family|·window) edges instead of O(|family|²) (sf10: 8.8M →
    // ~1.4M candidate pairs); recall is traded only when a hot bucket
    // mixes families. This is the shape that survives a 100 TB
    // embedding table with a pathological duplicate mass.
    "ann_dedup_clusters" -> ((s, dir) => {
      val (pairs, bound) = governedPairsWithBound(s, dir, minCos = CosThreshold)
      dedupClusters(prep(s, dir), pairs, pairBound = bound)
    }),

    // AUDIT: the historical fixed 6-plane, uncapped composition (20×
    // wall at 10× data — the documented quadratic counterfactual).
    "ann_dedup_clusters_fixed" -> ((s, dir) => {
      val p = prep(s, dir)
      dedupClusters(p, Ann.lshPairs(p, Planes, minCos = CosThreshold))
    }),

    // AUDIT: volume-governed planes WITHOUT the hot-bucket cap —
    // isolates the cap's cluster-level recall cost from the plane
    // governor's candidate savings.
    "ann_dedup_clusters_governed" -> ((s, dir) => {
      val p = prep(s, dir)
      val planes = PlanesAll.take(planesFor(p.count()))
      // uncapped plan → the triangular Σ C(bn,2) bound (same Memo'd
      // histogram scan as the governed default)
      val row = bucketStats(s, p, dir, planes)
      val bound = if (row.maxBucket > AnnBucketCap) -1L else row.pairBound
      dedupClusters(p, Ann.lshPairs(p, planes, minCos = CosThreshold),
        pairBound = bound)
    }),

    // SAMPLED composition twin (VERDICT r15 item 3 — the
    // text_neardup_clusters_sample precedent): the deterministic 25%
    // slice (vec_id % 4 = 0) restricted FIRST, then the SAME governed
    // pipeline — planes derived from the SAMPLE's count, cap gate from
    // the sample's bucket histogram, verified pairs, connected
    // components. At sf10 the full-corpus composition twin is
    // oracle-infeasible (recursive reach-closure over 200k nodes), so
    // this is the hash-gradable oracle for governed cluster FORMATION
    // at the scale the governor was built for.
    "ann_dedup_clusters_sample" -> ((s, dir) => {
      val p = prep(s, dir).filter(col("vec_id") % 4 === 0)
      val planes = PlanesAll.take(planesFor(p.count()))
      val stats = bucketStats(s, p, s"$dir#sample4", planes)
      val cap = if (stats.maxBucket > AnnBucketCap) Some(AnnBucketCap) else None
      val pairs = Ann.lshPairs(p, planes, minCos = CosThreshold,
        bucketCap = cap, window = AnnNeighborWindow)
      dedupClusters(p, pairs, pairBound = stats.pairBound)
    }),

    // IVF: probe the 2 nearest coarse partitions, exact top-k inside.
    "ann_ivf" -> ((s, dir) => {
      val q = prep(s, dir).filter(probeSet)
      Ann.ivfSearchPrepared(labeledPrep(s, dir), ivfCent(s, dir), q,
        nProbe = 2, k = TopK).orderBy("query_id", "rk")
    }),

    // SemDeDup-style semantic dedup: embeddings are pre-clustered
    // (label = the IVF coarse partition), and within each cluster a
    // vector is dropped iff a lower-id cluster-mate lies within the
    // cosine threshold. The pairwise pass is per-cluster (the
    // SemDeDup cost model: k scales with n so clusters stay bounded)
    // and salted, so a fat cluster spreads over the salt fan-out
    // instead of serializing — the embedding-space dedup a training
    // pipeline runs between exact and fuzzy text dedup.
    "ann_semdedup" -> ((s, dir) =>
      Ann.semDedup(labeledPrep(s, dir), minCos = CosThreshold).orderBy("vec_id")),

    // recall@k audit of the IVF path against brute-force ground
    // truth: per probe query, how many of the true top-k the
    // probe-bounded search recovered. "Measure, don't guess" for
    // approximate search — the number that decides whether nProbe
    // is set right BEFORE a 100 TB corpus is indexed with it. Cost
    // is one brute pass + one IVF pass over the BOUNDED probe set
    // (never all-pairs), so the audit itself scales like ann_topk.
    "ann_recall" -> ((s, dir) => {
      val p = prep(s, dir)
      val q = p.filter(probeSet)
      val truth = cosTruth(s, dir)
      val approx = Ann.ivfSearchPrepared(labeledPrep(s, dir), ivfCent(s, dir),
        q, nProbe = 2, k = TopK)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      truth.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(col("hit")).as("n_hits"),
          round(count(col("hit")) / count(lit(1)), 6).as("recall"))
        .orderBy("query_id")
    }),

    // nProbe-sizing curve: IVF recall@k at nProbe ∈ {1,2,4,8} over
    // the TRAINED k-means partitioning (not the shipped label
    // column). ann_recall measures 0.275 at sf1 with the given
    // labels — probing 2 of 10 near-arbitrary cells recovers ~30% —
    // so the knob question "what nProbe does THIS partitioning need
    // for the recall target?" gets its own audit. One brute-truth
    // pass + ONE Memo'd scored-candidate pass at the largest nProbe
    // (the subsets are nested by centroid rank, so each curve point
    // is a filter + window over the same frame, never a re-join).
    // Readout is exact integers (n_hits / n_truth per n_probe; every
    // probe has exactly TopK truths, so n_hits/n_truth IS the mean
    // recall) — no round(double) anywhere, per the dsir lesson.
    "ann_recall_curve" -> ((s, dir) => {
      import s.implicits._
      val p = prep(s, dir)
      val q = p.filter(probeSet)
      val truth = cosTruth(s, dir)
      val cand = graft.core.Memo.cached(s,
        s"ann_recall_curve:$dir:k$KmK:i$KmIters:p${ProbeCurve.max}") {
        val probeW = Window.partitionBy("query_id")
          .orderBy(col("d2").asc, col("label").asc)
        val probed = Ann.centroidDistances(
          q.select(col("vec_id"), col("v")), broadcast(coarseCent(s, dir)))
          .withColumn("crk", row_number().over(probeW))
          .filter(col("crk") <= ProbeCurve.max)
          .select(col("query_id"), col("label").cast("long").as("cell"), col("crk"))
        val neighbors = p.select(col("vec_id").as("neighbor_id"), col("u").as("nu"))
          .join(kmeansAssign(s, dir)
            .select(col("vec_id").as("neighbor_id"), col("cluster").as("cell")),
            Seq("neighbor_id"))
        probed.join(neighbors, Seq("cell"))
          .filter(col("neighbor_id") =!= col("query_id"))
          .join(broadcast(q.select(col("vec_id").as("query_id"), col("u").as("qu"))),
            Seq("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            Ann.cosine(col("qu"), col("nu")).as("cos"), col("crk"))
      }
      val w = Window.partitionBy("n_probe", "query_id")
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      val approx = ProbeCurve.map(np =>
        cand.filter(col("crk") <= np).withColumn("n_probe", lit(np)))
        .reduce(_ unionByName _)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= TopK)
        .select("n_probe", "query_id", "neighbor_id")
      val hits = approx.join(truth, Seq("query_id", "neighbor_id"))
        .groupBy("n_probe").agg(count(lit(1)).as("n_hits"))
      ProbeCurve.toDF("n_probe")
        .join(hits, Seq("n_probe"), "left")
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .select(col("n_probe"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          col("n_truth"))
        .orderBy("n_probe")
    }),

    // deterministic distributed k-means (Lloyd's): the operator that
    // PRODUCES the coarse partitions ann_ivf / ann_semdedup consume
    // instead of assuming a label column exists. Seeds = the k lowest
    // vec_ids, DECIMAL-exact component means, rounded distances with
    // low-label tie-break — so the clustering is reproducible across
    // engines/partitionings and a DuckDB twin can grade it. Fully
    // distributed: no driver collect at any step.
    "ann_kmeans" -> ((s, dir) =>
      kmeansAssign(s, dir).orderBy("vec_id")),

    // per-cluster audit of the k-means partitioning: size, total and
    // mean within-cluster squared distance (inertia). The number that
    // decides whether k is right BEFORE a 100 TB corpus is clustered
    // with it — balanced sizes and comparable inertia mean IVF/
    // SemDeDup per-bucket work stays bounded. One groupBy over the
    // assignment; the DECIMAL sum keeps the readout aggregation-order
    // independent.
    "ann_kmeans_stats" -> ((s, dir) => {
      // d2 is 4-dp-rounded: the DECIMAL(28,4) cast recovers the exact
      // grid value, the sum is exact, and the readout goes through an
      // exact BIGINT (the text_dsir lesson: never round(double) or
      // cast decimal→double where a grid boundary can land)
      val sumInt = (sum(col("d2").cast("decimal(28,4)")) * 10000).cast("long")
      kmeansAssign(s, dir)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_vectors"),
          (sumInt.cast("double") / 10000.0).as("inertia"),
          ((sumInt.cast("double") / count(lit(1)).cast("double"))
            / 10000.0).as("mean_d2"))
        .orderBy("cluster")
    }),

    // product quantization (the IVF-PQ building block): the vector
    // splits into PqSub subspaces, each clustered by the SAME
    // deterministic Lloyd's operator; a vector's code is its per-
    // subspace centroid ids (PqSub·log2(PqK) bits vs 64·32 — ~85×
    // compression here) and recon_d2 sums the per-subspace
    // quantization errors. Everything reuses the proven k-means
    // machinery — PQ at 100 TB is "run k bounded k-means jobs on
    // slice projections", nothing new to scale.
    "ann_pq" -> ((s, dir) =>
      graft.core.Memo.cached(s, s"ann_pq:$dir:s$PqSub:k$PqK:i$PqIters") {
        val p = prep(s, dir)
        val w = 64 / PqSub
        val parts = (0 until PqSub).map { sub =>
          Ann.kmeansFromCentroids(p.select(col("vec_id"),
            slice(col("v"), sub * w + 1, w).as("v")), pqCent(s, dir, sub))
            .select(col("vec_id"), col("cluster").as(s"code_$sub"),
              col("d2").as(s"d2_$sub"))
        }
        val joined = parts.reduce((a, b) => a.join(b, Seq("vec_id")))
        // exact-integer readout of the summed 4-dp subspace errors
        val reconInt = (0 until PqSub).map(sub =>
          (col(s"d2_$sub").cast("decimal(28,4)") * 10000).cast("long"))
          .reduce(_ + _)
        joined.select(col("vec_id") +:
          (0 until PqSub).map(sub => col(s"code_$sub")) :+
          (reconInt.cast("double") / 10000.0).as("recon_d2"): _*)
      }.orderBy("vec_id")),

    // recall@k audit of PQ/ADC search against exact-L2 truth over the
    // bounded probe set — the "measure, don't guess" number for the
    // PQ codebook (as ann_recall is for IVF's nProbe). Classic
    // asymmetric distance computation: per probe, a |codebook|-sized
    // lookup table of exact probe-to-centroid subspace distances
    // (tiny → broadcast); each corpus vector's approximate distance
    // is then the sum of 4 LUT hits on its codes — an equi-join on
    // the code value, never a full-vector comparison, so the scored
    // pass stays scan-speed at any corpus size. Truth is the same
    // bounded broadcast nested-loop every brute audit here uses.
    "ann_pq_recall" -> ((s, dir) => {
      val p = prep(s, dir)
      val w = 64 / PqSub
      // per-subspace (codes, LUT): codes = one small int per vector;
      // LUT = |probes|·PqK rows of exact probe-to-centroid distances
      // in exact-int micro-units
      val subs = (0 until PqSub).map { sub =>
        val sv = p.select(col("vec_id"), slice(col("v"), sub * w + 1, w).as("v"))
        val cent = pqCent(s, dir, sub)
        val codes = Ann.nearestCentroid(sv, cent)
          .select(col("vec_id"), col("label").as(s"c$sub"))
        val lut = Ann.centroidDistances(
          sv.filter(probeSet), broadcast(cent))
          .select(col("query_id"), col("label").as(s"c$sub"),
            (col("d2").cast("decimal(28,4)") * 10000).cast("long").as(s"di$sub"))
        (codes, lut)
      }
      // one row per (vector, probe) via 4 broadcast LUT joins and a
      // row-local sum — no aggregation shuffle anywhere in the scored
      // pass (the union+groupBy alternative re-shuffles 4·n·|probes|
      // rows just to add four numbers)
      val coded = subs.map(_._1).reduce(_.join(_, Seq("vec_id")))
      val scored = (1 until PqSub).foldLeft(
        coded.join(broadcast(subs(0)._2), Seq("c0"))) { (df, sub) =>
        df.join(broadcast(subs(sub)._2), Seq("query_id", s"c$sub"))
      }
      val approx = scored
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (0 until PqSub).map(sub => col(s"di$sub")).reduce(_ + _).as("d2i"))
      val aw = Window.partitionBy("query_id")
        .orderBy(col("d2i").asc, col("vec_id").asc)
      val approxTopk = approx
        .withColumn("rk", row_number().over(aw)).filter(col("rk") <= TopK)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          lit(1).as("hit"))
      l2Truth(s, dir).join(approxTopk, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(col("hit")).as("n_hits"),
          round(count(col("hit")) / count(lit(1)), 6).as("recall"))
        .orderBy("query_id")
    }),

    // the full SemDeDup pipeline end-to-end: k-means clustering over
    // raw embeddings, then within-cluster greedy cosine dedup — no
    // pre-existing labels anywhere. Composes the two proven pieces;
    // the pairwise pass stays per-cluster and salted.
    "ann_semdedup_kmeans" -> ((s, dir) => {
      val p = prep(s, dir)
      val labels = kmeansAssign(s, dir)
        .select(col("vec_id"), col("cluster").as("label"))
      Ann.semDedup(p.join(labels, Seq("vec_id")), minCos = CosThreshold)
        .orderBy("vec_id")
    }),

    // the composed IVF-PQ index (coarse k-means cell + PQ-on-residual
    // codes, Jégou et al. 2011): IpSub·log2(IpK) = 32 bits per vector
    // vs 64·32 raw — 64× compression — with the codebooks spending
    // their centroids on the residual the coarse quantizer didn't
    // explain. recon_d2 is the exact-BIGINT summed quantization
    // error — the number that sizes the codebook (measured 1.6×
    // below ann_pq's raw-slice codebooks even on the unstructured
    // sf0.01 slice; the recall audit below is the end-to-end check).
    "ann_ivf_pq" -> ((s, dir) => ipIndex(s, dir).orderBy("vec_id")),

    // the index as a DURABLE ARTIFACT: write the trained IVF-PQ index
    // (coarse centroids + residual codebooks + code table + manifest)
    // to parquet, load it back through graft.sources.AnnIndexIO, and
    // serve the code table from the LOADED artifacts. Graded by the
    // ann_ivf_pq oracle verbatim: the round trip must be bit-exact
    // (parquet round-trips doubles/longs exactly), proving the
    // persisted form alone is sufficient to serve searches. This is
    // the 100 TB posture — an index is trained once (hours of cluster
    // time) and consumed by every search job for weeks; nothing here
    // collects to the driver in either direction. The save runs once
    // per JVM (persistedIndexDir) — the production cost model, where
    // only load + serve recur per search job.
    "ann_ivf_pq_persist" -> ((s, dir) => {
      val idx = graft.sources.AnnIndexIO.load(s, persistedIndexDir(s, dir))
      idx.codes.orderBy("vec_id")
    }),

    // end-to-end recall@k audit of the IVF-PQ search path: coarse
    // probing (IpNProbe cells) → ADC scoring of the probed cells'
    // codes against per-(query, cell) residual LUTs → top-IpRerank
    // shortlist → EXACT re-rank of the shortlist → top-k, measured
    // against exact-L2 truth over the bounded probe set. This is the
    // standard production composition (FAISS IVFPQR): ADC never
    // touches a full vector (equi-joins on code values), the exact
    // re-rank touches only |probes|·IpRerank vectors, and the
    // brute-truth pass exists only because this is an audit. The
    // recall number is what sizes IpK/IpNProbe/IpRerank BEFORE a
    // 100 TB corpus is indexed (r9 measured the raw 4×8 codebook at
    // 0.47 — unusable; this composition is the fix).
    "ann_ivf_pq_recall" -> ((s, dir) =>
      ivfPqRecall(s, dir, coarseCent(s, dir), coarseCentVec(s, dir),
        sub => ipCent(s, dir, sub), ipIndex(s, dir))),

    // the SAME search pipeline served from the PERSISTED artifacts
    // (VERDICT r12 item 2): coarse centroids, residual codebooks and
    // the code table all come from AnnIndexIO.load — no Memo'd
    // training state is consulted anywhere in the index side of the
    // search. Graded by the ann_ivf_pq_recall oracle VERBATIM, so
    // this is the proof that the artifacts alone are sufficient to
    // serve searches (the stated purpose of persistence). Raw
    // vectors appear only where they must: probe queries (a search
    // arrives as a vector) and the exact re-rank of the shortlist,
    // which in production reads the primary store, never the index.
    "ann_ivf_pq_persist_recall" -> ((s, dir) => {
      val idx = graft.sources.AnnIndexIO.load(s, persistedIndexDir(s, dir))
      ivfPqRecall(s, dir, idx.coarseCentroids,
        graft.sources.AnnIndexIO.coarseCentVec(idx),
        sub => idx.codebooks(sub), idx.codes)
    }),

    // INCREMENTAL ingest against the persisted index (the other half
    // of the train-once posture): a deterministic md5-bucketed 25% of
    // the corpus plays "today's arrivals" and is encoded — coarse
    // cell + residual PQ codes + exact quantization error — purely
    // from the LOADED artifacts (AnnIndexIO.encode), no retraining,
    // no Memo'd session state. Graded against the full trained
    // index's twin restricted to the same ids: encoding is
    // per-vector, so encode-after-load must reproduce the trainer's
    // own rows bit-for-bit — the property that makes
    // encode-then-append sound for daily ingest at 100 TB.
    "ann_ivf_pq_encode" -> ((s, dir) => {
      val idx = graft.sources.AnnIndexIO.load(s, persistedIndexDir(s, dir))
      val fresh = prep(s, dir)
        .filter(substring(md5(col("vec_id").cast("string")), 1, 1)
          .isin("0", "1", "2", "3"))
        .select(col("vec_id"), col("v"))
      graft.sources.AnnIndexIO.encode(idx, fresh).orderBy("vec_id")
    }),

    // DELETION against the persisted index (take-down requests are a
    // fact of life for a 100 TB corpus): tombstone the md5-sampled
    // 25% (AnnIndexIO.remove — an append of ids, never a rewrite of
    // the code table), then COMPACT (fold tombstones into a new
    // generation) and serve. Exercises remove → live anti-join view →
    // compact → reload on the once-per-JVM mutation scratch (rewound
    // between reps — the timed path is the maintenance operators, not
    // file copying; VERDICT r13 item 1); graded against the trained
    // index's twin MINUS the removed ids. The oracle can't tell
    // tombstone-masked from physically-compacted rows — which is the
    // contract: consumers see identical data either side of
    // compaction.
    "ann_ivf_pq_remove" -> ((s, dir) => {
      val tmp = mutationScratch(s, dir) // copy-once; rewinds per call
      val doomed = prep(s, dir)
        .filter(substring(md5(col("vec_id").cast("string")), 1, 1)
          .isin("0", "1", "2", "3"))
        .select(col("vec_id"))
        .coalesce(1) // a take-down batch is one small id file
      graft.sources.AnnIndexIO.remove(tmp, doomed)
      graft.sources.AnnIndexIO.compact(s, tmp)
      graft.sources.AnnIndexIO.load(s, tmp).codes
        .orderBy("vec_id")
    })
  )

  /** The IVF-PQ search pipeline (see the ann_ivf_pq_recall scaladoc
    * above), parameterized over WHERE the index lives: the Memo'd
    * in-session frames (ann_ivf_pq_recall) or the loaded parquet
    * artifacts (ann_ivf_pq_persist_recall). `coarse`/`book(sub)` are
    * (label, dim, cval) centroid tables, `coarseVec` is (label long,
    * cv array), `codes` is the one-row-per-vector index table. */
  private def ivfPqRecall(s: SparkSession, dir: String,
      coarse: DataFrame, coarseVec: DataFrame,
      book: Int => DataFrame, codes: DataFrame): DataFrame = {
      val p = prep(s, dir)
      val w = 64 / IpSub
      val probes = p.filter(probeSet).select(col("vec_id"), col("v"))
      // coarse probing: IpNProbe nearest cells per query
      val probeW = Window.partitionBy("query_id")
        .orderBy(col("d2").asc, col("label").asc)
      val probed = Ann.centroidDistances(probes, broadcast(coarse))
        .withColumn("crk", row_number().over(probeW))
        .filter(col("crk") <= IpNProbe)
        .select(col("query_id"), col("label").cast("long").as("coarse"))
      // query residual wrt EACH probed cell (≤ |probes|·IpNProbe rows)
      val qres = probed
        .join(probes.select(col("vec_id").as("query_id"), col("v")), Seq("query_id"))
        .join(broadcast(coarseVec.withColumnRenamed("label", "coarse")),
          Seq("coarse"))
        .select(col("query_id"), col("coarse"),
          zip_with(col("v"), col("cv"), (a, b) => a - b).as("qrv"))
      // per-subspace ADC lookup tables: exact query-residual-to-
      // centroid subspace distances in BIGINT micro-units; |probes| ·
      // IpNProbe · IpK rows each — broadcast at any corpus size
      val luts = (0 until IpSub).map { sub =>
        qres.select(col("query_id"), col("coarse"),
          posexplode(slice(col("qrv"), sub * w + 1, w)).as(Seq("dim", "qx")))
          .join(broadcast(book(sub).select(
            col("label").cast("long").as(s"code_$sub"), col("dim"), col("cval"))),
            Seq("dim"))
          .groupBy("query_id", "coarse", s"code_$sub")
          .agg((round(sum((col("qx") - col("cval")) * (col("qx") - col("cval"))), 4)
            .cast("decimal(28,4)") * 10000).cast("long").as(s"di$sub"))
      }
      // scored pass: probed cells' index rows, IpSub broadcast LUT
      // equi-joins, row-local BIGINT sum — no aggregation exchange
      val coded = codes
        .join(probed, Seq("coarse"))
        .filter(col("vec_id") =!= col("query_id"))
      val scored = luts.zipWithIndex.foldLeft(coded) { case (df, (lut, sub)) =>
        df.join(broadcast(lut), Seq("query_id", "coarse", s"code_$sub"))
      }.select(col("query_id"), col("vec_id"),
        (0 until IpSub).map(sub => col(s"di$sub")).reduce(_ + _).as("d2i"))
      // ADC shortlist, then exact re-rank of |probes|·IpRerank rows
      val sw = Window.partitionBy("query_id").orderBy(col("d2i").asc, col("vec_id").asc)
      val short = scored.withColumn("srk", row_number().over(sw))
        .filter(col("srk") <= IpRerank)
        .select("query_id", "vec_id")
      val exd2 = round(aggregate(
        zip_with(col("qv"), col("nv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x), 4)
      val rw = Window.partitionBy("query_id").orderBy(col("d2").asc, col("vec_id").asc)
      val approxTopk = short
        .join(p.select(col("vec_id"), col("v").as("nv")), Seq("vec_id"))
        .join(broadcast(probes.select(col("vec_id").as("query_id"), col("v").as("qv"))),
          Seq("query_id"))
        .withColumn("d2", exd2)
        .withColumn("rk", row_number().over(rw)).filter(col("rk") <= TopK)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), lit(1).as("hit"))
      // exact-L2 truth over the bounded probe set — the shared Memo'd
      // table every PQ-family audit scores against
      l2Truth(s, dir).join(approxTopk, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(col("hit")).as("n_hits"),
          round(count(col("hit")) / count(lit(1)), 6).as("recall"))
        .orderBy("query_id")
  }

  /** Up to 16 deterministic hyperplanes for 64-dim embeddings
    * (md5-derived, regenerated bit-identically by any engine;
    * component (j,d) depends only on (j,d), so any prefix of this
    * table equals the same-length table). */
  private[graft] val MaxPlanes = 16
  private[graft] val PlanesAll: Seq[Seq[Double]] =
    Ann.hyperplanes(MaxPlanes, 64)

  /** The fixed-geometry plane set (6 planes) — the `_fixed` audits'
    * geometry, and the stable bucketing the STREAMING sign-LSH path
    * pins (state keys must not re-bucket as the corpus grows). */
  private[queries] val Planes: Seq[Seq[Double]] = PlanesAll.take(6)

  /** Volume-governed sign-LSH plane count (VERDICT r13 item 5): each
    * extra plane doubles the bucket count and halves the expected
    * bucket size, so the within-bucket pairwise cost of a FIXED
    * geometry grows quadratically with the corpus (measured: 17-23×
    * wall at 10× data, SCALE.md ANN table). Growing planes with
    * log2(corpus) pins expected bucket size at ~[[GovernedBucketTarget]]
    * — the same volume-derived-lever pattern as the dedup block cap
    * and the band-bucket governor. Integer-exact thresholds (no
    * floating log2 whose rounding could differ cross-engine): the
    * count is 6 + |{p ∈ 7..16 : n > target·2^(p−1)}|, i.e. the
    * smallest p with n ≤ target·2^p, clamped to [6, 16]. Recall per
    * retained pair falls as planes grow — the documented
    * recall-vs-cost lever, now sized by data volume instead of prose. */
  private[queries] val GovernedBucketTarget = 32L
  private[graft] def planesFor(n: Long): Int =
    6 + (7 to MaxPlanes).count(p => n > GovernedBucketTarget * (1L << (p - 1)))

  /** Hot-bucket cap for the governed defaults (VERDICT r14 item 1):
    * 2× the governed expected bucket size, so a bucket only switches
    * to the sorted-neighborhood policy when it is genuinely an
    * outlier under the plane governor's own target — duplicate
    * families, degenerate embedding modes — never the random-load
    * tail (declared sf0.01/sf0.1 buckets max out at 15/54, so the cap
    * is a measured no-op there; sf1 has 23 hot buckets and sf10 ~1.5k,
    * the divergent regimes the sweep hash-grades). Interpolated into
    * the DuckDB twins verbatim, like the text family's LshBucketCap. */
  private[graft] val AnnBucketCap: Int = (2L * GovernedBucketTarget).toInt
  /** Sorted-neighborhood width inside over-cap buckets (members pair
    * with their window−1 vec_id-rank successors — dedup's
    * hotBlockWindow pattern). */
  private[graft] val AnnNeighborWindow = 8

  /** DuckDB literal for one plane (Double.toString round-trips). */
  private def planeLit(p: Seq[Double]): String =
    p.map(_.toString).mkString("[", ", ", "]")

  /** Lloyd's-iteration CTE chain mirroring [[Ann.kmeans]] — appended
    * after a CTE `<src>` providing (vec_id, v), produces
    * `<p>asgf` = the final (vec_id, label, d2) assignment. Seeds =
    * the k lowest vec_ids; each round is one rounded-distance argmin
    * (ties → lower label) and one DECIMAL-exact component mean,
    * exactly the ann_ivf `cent`/`dist` fragments the sweep already
    * grades. `p` prefixes every CTE name so multiple chains (the PQ
    * subspaces) compose in one statement. */
  private def kmeansChain(p: String, src: String, k: Int, iters: Int): String = {
    def assign(name: String, centName: String) =
      s"""${p}dist_$name AS (
         |  SELECT vec_id, c.label, round(sum((x - cval) * (x - cval)), 4) AS d2
         |  FROM ${p}vdim JOIN $centName c USING (dim) GROUP BY 1, 2
         |), $p$name AS (
         |  SELECT vec_id, label, d2 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2 ASC, label ASC) AS rk FROM ${p}dist_$name)
         |  WHERE rk = 1
         |)""".stripMargin
    def update(centName: String, asgName: String) =
      s"""$centName AS (
         |  SELECT a.label, d.dim,
         |         CAST(sum(CAST(d.x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS cval
         |  FROM $asgName a JOIN ${p}vdim d USING (vec_id) GROUP BY 1, 2
         |)""".stripMargin
    val iterated = (1 to iters).map(i =>
      assign(s"asg$i", s"${p}cent${i - 1}") + ",\n" +
        update(s"${p}cent$i", s"${p}asg$i")).mkString(",\n")
    s"""${p}vdim AS MATERIALIZED (
       |  SELECT vec_id, dim - 1 AS dim, x FROM (
       |    SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM $src)
       |), ${p}seeds AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS label, vec_id
       |  FROM (SELECT vec_id FROM $src ORDER BY vec_id LIMIT $k)
       |), ${p}cent0 AS (
       |  SELECT s.label, d.dim, d.x AS cval
       |  FROM ${p}seeds s JOIN ${p}vdim d USING (vec_id)
       |),
       |$iterated,
       |${assign("asgf", s"${p}cent$iters")}""".stripMargin
  }

  /** The whole-vector chain used by the three k-means twins
    * (prefix "" keeps the original `asgf` name). */
  private val kmeansCtes: String = kmeansChain("", "e", KmK, KmIters)

  /** Shared IVF-PQ oracle fragments (appended after prepCte +
    * kmeansCtes): assembled coarse centroid vectors → residuals →
    * IpSub sliced residual chains → the coded index `idx`. Mirrors
    * ipResid/ipCent/ipIndex exactly. */
  private val ivfPqCtes: String = {
    val w = 64 / IpSub
    val subCtes = (0 until IpSub).map(sub =>
      s"rsub$sub AS (SELECT vec_id, rv[${sub * w + 1}:${(sub + 1) * w}] AS v FROM resid)")
      .mkString(", ")
    val chains = (0 until IpSub).map(sub =>
      kmeansChain(s"r$sub", s"rsub$sub", IpK, IpIters)).mkString(",\n")
    val codes = (0 until IpSub).map(sub =>
      s"CAST(a$sub.label AS BIGINT) AS code_$sub").mkString(",\n  ")
    val recon = (0 until IpSub).map(sub =>
      s"CAST(CAST(a$sub.d2 AS DECIMAL(28,4)) * 10000 AS BIGINT)").mkString(" + ")
    val joins = (0 until IpSub).map(sub =>
      s"JOIN r${sub}asgf a$sub USING (vec_id)").mkString(" ")
    s"""cv AS (
       |  SELECT label, list(cval ORDER BY dim) AS cvec
       |  FROM cent$KmIters GROUP BY label
       |), resid AS MATERIALIZED (
       |  SELECT e.vec_id, CAST(a.label AS BIGINT) AS coarse,
       |         list_transform(generate_series(1, len(e.v)),
       |           i -> e.v[i] - c.cvec[i]) AS rv
       |  FROM e JOIN asgf a USING (vec_id) JOIN cv c ON c.label = a.label
       |), $subCtes,
       |$chains,
       |idx AS MATERIALIZED (
       |  SELECT r.vec_id, r.coarse,
       |  $codes,
       |  CAST($recon AS DOUBLE) / 10000.0 AS recon_d2
       |  FROM resid r $joins
       |)""".stripMargin
  }

  /** Shared DuckDB fragments. `where` restricts the corpus BEFORE
    * anything downstream sees it (the sampled twins' restriction —
    * identical placement to the Spark side's filter-first prep). */
  private def prepCteFor(where: String): String = {
    val w = if (where.isEmpty) "" else s" WHERE $where"
    s"""WITH e AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings$w
       |), n AS (
       |  SELECT vec_id, label, v,
       |         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |  FROM e
       |)""".stripMargin
  }
  private val prepCte: String = prepCteFor("")

  /** Mirrors the Spark side exactly: per-element division by the norm
    * (prenormalized vectors), then an index-ordered dot product. */
  // nullif/coalesce guard: Ann.prepared defines cos(zero-vector, x)
  // = 0 (zero-norm rows normalize to the zero vector, never dup /
  // never match). A bare division by nrm = 0 would give NaN here, and
  // DuckDB orders NaN above every number — a zero-norm vector would
  // "clear" every cosine threshold the Spark side says it misses.
  private def cosSql(qv: String, nv: String, qn: String, nn: String): String =
    s"round(coalesce(list_sum(list_transform(generate_series(1, len($qv)), " +
      s"i -> ($qv[i] / nullif($qn, 0)) * ($nv[i] / nullif($nn, 0)))), 0), 6)"

  val oracle: Map[String, String] = oracleBase +
    // the persisted-artifact search must reproduce the in-session
    // search exactly — same twin verbatim (the whole point: no Memo'd
    // training state may influence the served result)
    ("ann_ivf_pq_persist_recall" -> oracleBase("ann_ivf_pq_recall")) +
    // encoding new arrivals from the loaded artifacts must reproduce
    // the trainer's own code rows for those ids — the full-index twin
    // restricted to the sampled "arrivals"
    ("ann_ivf_pq_encode" -> oracleBase("ann_ivf_pq").replace(
      "SELECT * FROM idx ORDER BY vec_id",
      "SELECT * FROM idx WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) " +
        "IN ('0','1','2','3') ORDER BY vec_id")) +
    // remove+compact must serve exactly the trained index minus the
    // tombstoned ids — the complement of the encode sample
    ("ann_ivf_pq_remove" -> oracleBase("ann_ivf_pq").replace(
      "SELECT * FROM idx ORDER BY vec_id",
      "SELECT * FROM idx WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) " +
        "NOT IN ('0','1','2','3') ORDER BY vec_id"))

  /** The governed twins derive the SAME plane count from the SAME
    * integer thresholds as planesFor (no floating log2 — the
    * comparisons are exact in both engines), then bucket with the
    * first np of the 16 shared hyperplane literals: bit weights and
    * plane values agree with the Spark side bit-for-bit, so the
    * governor is hash-gated at every sf instead of spec-asserted.
    * `governedCtes` = "pc" (the derived plane count) + "bucketed"
    * (vectors with governed bucket ids), appended after prepCte. */
  private def governedCtesFor(where: String): String = {
    val w = if (where.isEmpty) "" else s" WHERE $where"
    val thresholds = (7 to MaxPlanes).map(p =>
      s"(CASE WHEN cnt > ${GovernedBucketTarget * (1L << (p - 1))} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val bucketTerms = PlanesAll.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN $j < np AND list_sum(list_transform(generate_series(1, len(v)), " +
        s"i -> v[i] * (${planeLit(p)})[i])) > 0 THEN CAST(${1L << j} AS BIGINT) " +
        s"ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    // the plane count derives from the RESTRICTED corpus volume —
    // the sampled twin's governor must see the sample's count, same
    // as the Spark side's planesFor(sample.count())
    s"""pc AS (
       |  SELECT 6 + ($thresholds) AS np
       |  FROM (SELECT count(*) AS cnt FROM embeddings$w)
       |), bucketed AS (
       |  SELECT vec_id, v, nrm, ($bucketTerms) AS bucket FROM n, pc
       |)""".stripMargin
  }
  private lazy val governedCtes: String = governedCtesFor("")

  /** The hot-bucket cap over the governed buckets, mirrored exactly:
    * buckets ≤ AnnBucketCap members pair triangularly; over-cap
    * buckets rank members by vec_id and pair rank-adjacently within
    * AnnNeighborWindow (a_id < b_id holds in both branches — the rank
    * follows vec_id order). Appended after governedCtes; `cpairs` is
    * the unfiltered candidate pair set (caller applies its θ). */
  private lazy val cappedPairCtes: String =
    s"""bsz AS (
       |  SELECT bucket, count(*) AS bn FROM bucketed GROUP BY bucket
       |), smallb AS (
       |  SELECT b.* FROM bucketed b JOIN bsz USING (bucket)
       |  WHERE bn <= $AnnBucketCap
       |), hotb AS (
       |  SELECT b.*, row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rnk
       |  FROM bucketed b JOIN bsz USING (bucket) WHERE bn > $AnnBucketCap
       |), cpairs AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bucket,
       |         ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} AS cos
       |  FROM smallb a JOIN smallb b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  UNION ALL
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bucket,
       |         ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} AS cos
       |  FROM hotb a JOIN hotb b
       |    ON a.bucket = b.bucket AND b.rnk > a.rnk
       |   AND b.rnk <= a.rnk + ${AnnNeighborWindow - 1}
       |)""".stripMargin

  private lazy val oracleBase: Map[String, String] = Map(
    // the governed DEFAULT: plane count and hot-bucket cap both
    // derived from the same integer thresholds as the Spark side
    "ann_lsh_pairs" ->
      s"""$prepCte, $governedCtes, $cappedPairCtes
         |SELECT a_id, b_id, bucket, cos FROM cpairs
         |WHERE cos >= 0.20
         |ORDER BY a_id, b_id""".stripMargin,

    "ann_dedup_clusters" ->
      s"""WITH RECURSIVE ${prepCte.stripPrefix("WITH ")}, $governedCtes,
         |$cappedPairCtes, pairs AS MATERIALIZED (
         |  SELECT a_id, b_id FROM cpairs WHERE cos >= $CosThreshold
         |), edges AS MATERIALIZED (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION ALL SELECT b_id, a_id FROM pairs
         |), reach(id, lbl) AS (
         |  SELECT vec_id, vec_id FROM n
         |  UNION
         |  SELECT e2.dst, r.lbl FROM reach r JOIN edges e2 ON e2.src = r.id
         |), cc AS (
         |  SELECT id AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY id
         |)
         |SELECT vec_id, cluster_id,
         |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |       vec_id = cluster_id AS is_canonical
         |FROM cc ORDER BY vec_id""".stripMargin,

    // the governed composition on the deterministic 25% slice —
    // restriction first, then the identical governed CTE chain with
    // the plane count derived from the SAMPLE's volume
    "ann_dedup_clusters_sample" -> {
      val sampleWhere = "vec_id % 4 = 0"
      s"""WITH RECURSIVE ${prepCteFor(sampleWhere).stripPrefix("WITH ")},
         |${governedCtesFor(sampleWhere)},
         |$cappedPairCtes, pairs AS MATERIALIZED (
         |  SELECT a_id, b_id FROM cpairs WHERE cos >= $CosThreshold
         |), edges AS MATERIALIZED (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION ALL SELECT b_id, a_id FROM pairs
         |), reach(id, lbl) AS (
         |  SELECT vec_id, vec_id FROM n
         |  UNION
         |  SELECT e2.dst, r.lbl FROM reach r JOIN edges e2 ON e2.src = r.id
         |), cc AS (
         |  SELECT id AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY id
         |)
         |SELECT vec_id, cluster_id,
         |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |       vec_id = cluster_id AS is_canonical
         |FROM cc ORDER BY vec_id""".stripMargin
    },

    "ann_lsh_pairs_governed" ->
      s"""$prepCte, $governedCtes
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bucket,
         |       ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} AS cos
         |FROM bucketed a JOIN bucketed b
         |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} >= 0.20
         |ORDER BY a_id, b_id""".stripMargin,

    // same candidate semantics as ann_lsh_pairs_governed; components
    // via the same recursive reachability closure as the fixed-
    // geometry ann_dedup_clusters twin below
    "ann_dedup_clusters_governed" ->
      s"""WITH RECURSIVE ${prepCte.stripPrefix("WITH ")}, $governedCtes, pairs AS MATERIALIZED (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM bucketed a JOIN bucketed b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} >= $CosThreshold
         |), edges AS MATERIALIZED (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION ALL SELECT b_id, a_id FROM pairs
         |), reach(id, lbl) AS (
         |  SELECT vec_id, vec_id FROM n
         |  UNION
         |  SELECT e2.dst, r.lbl FROM reach r JOIN edges e2 ON e2.src = r.id
         |), cc AS (
         |  SELECT id AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY id
         |)
         |SELECT vec_id, cluster_id,
         |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |       vec_id = cluster_id AS is_canonical
         |FROM cc ORDER BY vec_id""".stripMargin,

    "ann_topk" ->
      s"""$prepCte, q AS (SELECT * FROM n WHERE ${probeSql()}),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         ${cosSql("q.v", "n.v", "q.nrm", "n.nrm")} AS cos
         |  FROM q JOIN n ON n.vec_id <> q.vec_id)
         |SELECT query_id, rk, neighbor_id, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rk
         |  FROM scored) WHERE rk <= $TopK
         |ORDER BY query_id, rk""".stripMargin,

    "ann_threshold_pairs" ->
      s"""$prepCte
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |       ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} AS cos
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE a.vec_id % $QueryMod = 0 AND a.vec_id < $ProbeIdCap
         |  AND ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} >= $CosThreshold
         |ORDER BY a_id, b_id""".stripMargin,

    "ann_quantize" ->
      s"""$prepCte, qz AS (
         |  SELECT vec_id, v,
         |         list_transform(v, x -> round(GREATEST(-1.0, LEAST(1.0, x)) * 127)) AS q
         |  FROM n
         |)
         |SELECT vec_id,
         |       CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT))) AS BIGINT) AS q_sum,
         |       CAST(list_min(q) AS BIGINT) AS q_min,
         |       CAST(list_max(q) AS BIGINT) AS q_max,
         |       round(sqrt(list_sum(list_transform(generate_series(1, len(v)),
         |         i -> (v[i] - q[i] / 127.0) * (v[i] - q[i] / 127.0)))), 6) AS recon_err
         |FROM qz ORDER BY vec_id""".stripMargin,

    "ann_lsh_pairs_fixed" -> {
      val bucketTerms = Planes.zipWithIndex.map { case (p, j) =>
        s"(CASE WHEN list_sum(list_transform(generate_series(1, len(v)), " +
          s"i -> v[i] * (${planeLit(p)})[i])) > 0 THEN CAST(${1L << j} AS BIGINT) " +
          s"ELSE CAST(0 AS BIGINT) END)"
      }.mkString(" + ")
      s"""$prepCte, bucketed AS (
         |  SELECT vec_id, v, nrm, ($bucketTerms) AS bucket FROM n
         |)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bucket,
         |       ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} AS cos
         |FROM bucketed a JOIN bucketed b
         |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} >= 0.20
         |ORDER BY a_id, b_id""".stripMargin
    },

    "ann_doc_topk" ->
      s"""$prepCte, q AS (SELECT * FROM n WHERE ${probeSql()}),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         ${cosSql("q.v", "n.v", "q.nrm", "n.nrm")} AS cos
         |  FROM q JOIN n ON n.vec_id <> q.vec_id),
         |topk AS (
         |  SELECT query_id, rk, neighbor_id, cos FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rk
         |    FROM scored) WHERE rk <= $TopK)
         |SELECT query_id, rk, neighbor_id, cos, d.lang, d.source
         |FROM topk JOIN documents d ON d.doc_id = topk.neighbor_id
         |ORDER BY query_id, rk""".stripMargin,

    "ann_dedup_clusters_fixed" -> {
      val bucketTerms = Planes.zipWithIndex.map { case (p, j) =>
        s"(CASE WHEN list_sum(list_transform(generate_series(1, len(v)), " +
          s"i -> v[i] * (${planeLit(p)})[i])) > 0 THEN CAST(${1L << j} AS BIGINT) " +
          s"ELSE CAST(0 AS BIGINT) END)"
      }.mkString(" + ")
      // same candidate semantics as ann_lsh_pairs; components via a
      // recursive label-reachability closure (min reachable vec_id =
      // the Spark side's min-label component id)
      s"""WITH RECURSIVE ${prepCte.stripPrefix("WITH ")}, bucketed AS (
         |  SELECT vec_id, v, nrm, ($bucketTerms) AS bucket FROM n
         |), pairs AS MATERIALIZED (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM bucketed a JOIN bucketed b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} >= $CosThreshold
         |), edges AS MATERIALIZED (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION ALL SELECT b_id, a_id FROM pairs
         |), reach(id, lbl) AS (
         |  SELECT vec_id, vec_id FROM n
         |  UNION
         |  SELECT e2.dst, r.lbl FROM reach r JOIN edges e2 ON e2.src = r.id
         |), cc AS (
         |  SELECT id AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY id
         |)
         |SELECT vec_id, cluster_id,
         |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |       vec_id = cluster_id AS is_canonical
         |FROM cc ORDER BY vec_id""".stripMargin
    },

    "ann_ivf" ->
      s"""$prepCte, q AS (SELECT * FROM n WHERE ${probeSql()}),
         |comp AS (
         |  SELECT label, dim - 1 AS dim, x FROM (
         |    SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM e)
         |), cent AS (
         |  SELECT label, dim,
         |         CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS cval
         |  FROM comp GROUP BY 1, 2
         |), qdim AS (
         |  SELECT vec_id AS query_id, dim - 1 AS dim, qx FROM (
         |    SELECT vec_id, unnest(v) AS qx, generate_subscripts(v, 1) AS dim FROM q)
         |), dist AS (
         |  SELECT query_id, c.label,
         |         round(sum((qx - cval) * (qx - cval)), 4) AS d2
         |  FROM qdim JOIN cent c ON qdim.dim = c.dim
         |  GROUP BY 1, 2
         |), probed AS (
         |  SELECT query_id, label FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2 ASC, label ASC) AS crk FROM dist)
         |  WHERE crk <= 2
         |), scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         ${cosSql("q.v", "n.v", "q.nrm", "n.nrm")} AS cos
         |  FROM probed p
         |  JOIN n ON n.label = p.label
         |  JOIN q ON q.vec_id = p.query_id
         |  WHERE n.vec_id <> q.vec_id)
         |SELECT query_id, rk, neighbor_id, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rk
         |  FROM scored) WHERE rk <= $TopK
         |ORDER BY query_id, rk""".stripMargin,

    // SemDeDup: same greedy keep-lowest-id rule as the Spark side —
    // a vector is a dup iff a lower-id same-label vector clears the
    // cosine threshold; min such id = dup_of.
    "ann_kmeans" ->
      s"""$prepCte, $kmeansCtes
         |SELECT vec_id, CAST(label AS BIGINT) AS cluster, d2,
         |       CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS cluster_size
         |FROM asgf ORDER BY vec_id""".stripMargin,

    "ann_kmeans_stats" ->
      s"""$prepCte, $kmeansCtes
         |SELECT CAST(label AS BIGINT) AS cluster,
         |  count(*) AS n_vectors,
         |  CAST(CAST(sum(CAST(d2 AS DECIMAL(28,4))) * 10000 AS BIGINT) AS DOUBLE)
         |    / 10000.0 AS inertia,
         |  (CAST(CAST(sum(CAST(d2 AS DECIMAL(28,4))) * 10000 AS BIGINT) AS DOUBLE)
         |    / count(*)) / 10000.0 AS mean_d2
         |FROM asgf GROUP BY 1 ORDER BY cluster""".stripMargin,

    "ann_pq" -> {
      val w = 64 / PqSub
      val subCtes = (0 until PqSub).map(sub =>
        s"sub$sub AS (SELECT vec_id, v[${sub * w + 1}:${(sub + 1) * w}] AS v FROM e)")
        .mkString(", ")
      val chains = (0 until PqSub).map(sub =>
        kmeansChain(s"q$sub", s"sub$sub", PqK, PqIters)).mkString(",\n")
      val codes = (0 until PqSub).map(sub =>
        s"CAST(a$sub.label AS BIGINT) AS code_$sub").mkString(",\n  ")
      val recon = (0 until PqSub).map(sub =>
        s"CAST(CAST(a$sub.d2 AS DECIMAL(28,4)) * 10000 AS BIGINT)").mkString(" + ")
      val joins = (1 until PqSub).map(sub =>
        s"JOIN q${sub}asgf a$sub USING (vec_id)").mkString(" ")
      s"""$prepCte, $subCtes,
         |$chains
         |SELECT a0.vec_id,
         |  $codes,
         |  CAST($recon AS DOUBLE) / 10000.0 AS recon_d2
         |FROM q0asgf a0 $joins
         |ORDER BY vec_id""".stripMargin
    },

    "ann_pq_recall" -> {
      val w = 64 / PqSub
      val subCtes = (0 until PqSub).map(sub =>
        s"sub$sub AS (SELECT vec_id, v[${sub * w + 1}:${(sub + 1) * w}] AS v FROM e)")
        .mkString(", ")
      val chains = (0 until PqSub).map(sub =>
        kmeansChain(s"q$sub", s"sub$sub", PqK, PqIters)).mkString(",\n")
      val luts = (0 until PqSub).map(sub =>
        s"""lut$sub AS (
           |  SELECT d.vec_id AS query_id, c.label,
           |         round(sum((d.x - c.cval) * (d.x - c.cval)), 4) AS d2
           |  FROM q${sub}vdim d JOIN q${sub}cent$PqIters c USING (dim)
           |  WHERE ${probeSql("d.vec_id")}
           |  GROUP BY 1, 2
           |)""".stripMargin).mkString(",\n")
      val app = (0 until PqSub).map(sub =>
        s"""  SELECT l.query_id, a.vec_id,
           |         CAST(CAST(l.d2 AS DECIMAL(28,4)) * 10000 AS BIGINT) AS di
           |  FROM q${sub}asgf a JOIN lut$sub l ON l.label = a.label""".stripMargin)
        .mkString("\n  UNION ALL\n")
      s"""$prepCte, $subCtes,
         |$chains,
         |$luts,
         |app AS (
         |$app
         |), approx AS (
         |  SELECT query_id, vec_id, CAST(sum(di) AS BIGINT) AS d2i
         |  FROM app WHERE vec_id <> query_id GROUP BY 1, 2
         |), atop AS (
         |  SELECT query_id, vec_id AS neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2i ASC, vec_id ASC) AS rk FROM approx)
         |  WHERE rk <= $TopK
         |), tscored AS (
         |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(generate_series(1, len(q.v)),
         |           i -> (q.v[i] - x.v[i]) * (q.v[i] - x.v[i]))), 4) AS d2
         |  FROM e q JOIN e x ON x.vec_id <> q.vec_id
         |  WHERE ${probeSql("q.vec_id")}
         |), truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2 ASC, neighbor_id ASC) AS rk FROM tscored)
         |  WHERE rk <= $TopK)
         |SELECT t.query_id,
         |       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
         |       round(count(a.neighbor_id) / count(*), 6) AS recall
         |FROM truth t LEFT JOIN atop a
         |  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
         |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin
    },

    "ann_ivf_pq" ->
      s"""$prepCte, $kmeansCtes,
         |$ivfPqCtes
         |SELECT * FROM idx ORDER BY vec_id""".stripMargin,

    // the persisted-and-reloaded index must equal the freshly-trained
    // one bit-for-bit — same twin verbatim
    "ann_ivf_pq_persist" ->
      s"""$prepCte, $kmeansCtes,
         |$ivfPqCtes
         |SELECT * FROM idx ORDER BY vec_id""".stripMargin,

    "ann_ivf_pq_recall" -> {
      val w = 64 / IpSub
      val luts = (0 until IpSub).map { sub =>
        val (lo, hi) = (sub * w + 1, (sub + 1) * w)
        s"""lutq$sub AS (
           |  SELECT q.query_id, q.coarse, c.label AS code_$sub,
           |         CAST(CAST(round(sum((q.qx - c.cval) * (q.qx - c.cval)), 4)
           |           AS DECIMAL(28,4)) * 10000 AS BIGINT) AS di$sub
           |  FROM (
           |    SELECT query_id, coarse,
           |           unnest(qrv[$lo:$hi]) AS qx,
           |           generate_subscripts(qrv[$lo:$hi], 1) - 1 AS dim
           |    FROM qres) q
           |  JOIN r${sub}cent$IpIters c USING (dim)
           |  GROUP BY 1, 2, 3
           |)""".stripMargin
      }.mkString(",\n")
      val lutJoins = (0 until IpSub).map(sub =>
        s"  JOIN lutq$sub l$sub ON l$sub.query_id = p.query_id " +
          s"AND l$sub.coarse = p.coarse AND l$sub.code_$sub = i.code_$sub")
        .mkString("\n")
      val dsum = (0 until IpSub).map(sub => s"l$sub.di$sub").mkString(" + ")
      s"""$prepCte, $kmeansCtes,
         |$ivfPqCtes,
         |pdist AS (
         |  SELECT vec_id AS query_id, c.label,
         |         round(sum((x - cval) * (x - cval)), 4) AS d2
         |  FROM vdim JOIN cent$KmIters c USING (dim)
         |  WHERE ${probeSql("vec_id")}
         |  GROUP BY 1, 2
         |), probed AS (
         |  SELECT query_id, CAST(label AS BIGINT) AS coarse FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2 ASC, label ASC) AS crk FROM pdist)
         |  WHERE crk <= $IpNProbe
         |), qres AS (
         |  SELECT p.query_id, p.coarse,
         |         list_transform(generate_series(1, len(e.v)),
         |           i -> e.v[i] - c.cvec[i]) AS qrv
         |  FROM probed p
         |  JOIN e ON e.vec_id = p.query_id
         |  JOIN cv c ON CAST(c.label AS BIGINT) = p.coarse
         |),
         |$luts,
         |scored AS (
         |  SELECT p.query_id, i.vec_id, $dsum AS d2i
         |  FROM probed p
         |  JOIN idx i ON i.coarse = p.coarse AND i.vec_id <> p.query_id
         |$lutJoins
         |), short AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2i ASC, vec_id ASC) AS srk FROM scored)
         |  WHERE srk <= $IpRerank
         |), rr AS (
         |  SELECT s.query_id, s.vec_id,
         |         round(list_sum(list_transform(generate_series(1, len(q.v)),
         |           i -> (q.v[i] - x.v[i]) * (q.v[i] - x.v[i]))), 4) AS d2
         |  FROM short s
         |  JOIN e q ON q.vec_id = s.query_id
         |  JOIN e x ON x.vec_id = s.vec_id
         |), atop AS (
         |  SELECT query_id, vec_id AS neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2 ASC, vec_id ASC) AS rk FROM rr)
         |  WHERE rk <= $TopK
         |), tscored AS (
         |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(generate_series(1, len(q.v)),
         |           i -> (q.v[i] - x.v[i]) * (q.v[i] - x.v[i]))), 4) AS d2
         |  FROM e q JOIN e x ON x.vec_id <> q.vec_id
         |  WHERE ${probeSql("q.vec_id")}
         |), truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2 ASC, neighbor_id ASC) AS rk FROM tscored)
         |  WHERE rk <= $TopK)
         |SELECT t.query_id,
         |       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
         |       round(count(a.neighbor_id) / count(*), 6) AS recall
         |FROM truth t LEFT JOIN atop a
         |  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
         |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin
    },

    "ann_semdedup_kmeans" ->
      s"""$prepCte, $kmeansCtes, nl AS MATERIALIZED (
         |  SELECT n.vec_id, CAST(a.label AS BIGINT) AS label, n.v, n.nrm
         |  FROM n JOIN asgf a USING (vec_id)
         |), dups AS (
         |  SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
         |  FROM nl a JOIN nl b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} >= $CosThreshold
         |  GROUP BY 1
         |)
         |SELECT nl.vec_id, nl.label, d.dup_of, d.dup_of IS NOT NULL AS is_dup
         |FROM nl LEFT JOIN dups d USING (vec_id)
         |ORDER BY vec_id""".stripMargin,

    "ann_semdedup" ->
      s"""$prepCte, dups AS (
         |  SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
         |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} >= $CosThreshold
         |  GROUP BY 1
         |)
         |SELECT n.vec_id, n.label, d.dup_of, d.dup_of IS NOT NULL AS is_dup
         |FROM n LEFT JOIN dups d USING (vec_id)
         |ORDER BY vec_id""".stripMargin,

    // recall@k: brute-force truth and IVF result computed in the same
    // statement, joined per (query, neighbor). count(hit-col) counts
    // non-nulls in both engines; BIGINT/BIGINT division is DOUBLE in
    // both.
    "ann_recall" ->
      s"""$prepCte, q AS (SELECT * FROM n WHERE ${probeSql()}),
         |tscored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         ${cosSql("q.v", "n.v", "q.nrm", "n.nrm")} AS cos
         |  FROM q JOIN n ON n.vec_id <> q.vec_id),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rk
         |    FROM tscored) WHERE rk <= $TopK),
         |comp AS (
         |  SELECT label, dim - 1 AS dim, x FROM (
         |    SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM e)
         |), cent AS (
         |  SELECT label, dim,
         |         CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS cval
         |  FROM comp GROUP BY 1, 2
         |), qdim AS (
         |  SELECT vec_id AS query_id, dim - 1 AS dim, qx FROM (
         |    SELECT vec_id, unnest(v) AS qx, generate_subscripts(v, 1) AS dim FROM q)
         |), dist AS (
         |  SELECT query_id, c.label,
         |         round(sum((qx - cval) * (qx - cval)), 4) AS d2
         |  FROM qdim JOIN cent c ON qdim.dim = c.dim
         |  GROUP BY 1, 2
         |), probed AS (
         |  SELECT query_id, label FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2 ASC, label ASC) AS crk FROM dist)
         |  WHERE crk <= 2
         |), iscored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         ${cosSql("q.v", "n.v", "q.nrm", "n.nrm")} AS cos
         |  FROM probed p
         |  JOIN n ON n.label = p.label
         |  JOIN q ON q.vec_id = p.query_id
         |  WHERE n.vec_id <> q.vec_id),
         |ivf AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rk
         |    FROM iscored) WHERE rk <= $TopK)
         |SELECT t.query_id,
         |       CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
         |       round(count(i.neighbor_id) / count(*), 6) AS recall
         |FROM truth t LEFT JOIN ivf i
         |  ON i.query_id = t.query_id AND i.neighbor_id = t.neighbor_id
         |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin,

    "ann_recall_curve" -> {
      val npValues = ProbeCurve.map(np => s"($np)").mkString(", ")
      s"""$prepCte, $kmeansCtes,
         |q AS (SELECT * FROM n WHERE ${probeSql()}),
         |tscored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         ${cosSql("q.v", "n.v", "q.nrm", "n.nrm")} AS cos
         |  FROM q JOIN n ON n.vec_id <> q.vec_id),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rk
         |    FROM tscored) WHERE rk <= $TopK),
         |qcdist AS (
         |  SELECT vec_id AS query_id, c.label,
         |         round(sum((x - cval) * (x - cval)), 4) AS d2
         |  FROM vdim JOIN cent$KmIters c USING (dim)
         |  WHERE ${probeSql()} GROUP BY 1, 2
         |), probed AS (
         |  SELECT query_id, CAST(label AS BIGINT) AS cell, crk FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2 ASC, label ASC) AS crk FROM qcdist)
         |  WHERE crk <= ${ProbeCurve.max}
         |), nn AS (
         |  SELECT n.vec_id, n.v, n.nrm, CAST(a.label AS BIGINT) AS cell
         |  FROM n JOIN asgf a USING (vec_id)
         |), cand AS (
         |  SELECT p.query_id, nn.vec_id AS neighbor_id,
         |         ${cosSql("q.v", "nn.v", "q.nrm", "nn.nrm")} AS cos, p.crk
         |  FROM probed p
         |  JOIN nn ON nn.cell = p.cell
         |  JOIN q ON q.vec_id = p.query_id
         |  WHERE nn.vec_id <> p.query_id
         |), approx AS (
         |  SELECT n_probe, query_id, neighbor_id FROM (
         |    SELECT np.n_probe, c.query_id, c.neighbor_id,
         |           row_number() OVER (PARTITION BY np.n_probe, c.query_id
         |             ORDER BY c.cos DESC, c.neighbor_id ASC) AS rk
         |    FROM (VALUES $npValues) np(n_probe)
         |    JOIN cand c ON c.crk <= np.n_probe)
         |  WHERE rk <= $TopK
         |), hits AS (
         |  SELECT a.n_probe, count(*) AS n_hits
         |  FROM approx a JOIN truth t USING (query_id, neighbor_id)
         |  GROUP BY 1
         |)
         |SELECT CAST(np.n_probe AS INTEGER) AS n_probe,
         |       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       (SELECT count(*) FROM truth) AS n_truth
         |FROM (VALUES $npValues) np(n_probe)
         |LEFT JOIN hits h ON h.n_probe = np.n_probe
         |ORDER BY n_probe""".stripMargin
    }
  )
}
