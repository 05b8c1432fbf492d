package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Durable IVF-PQ index artifacts — the save/load layer a real
  * pipeline needs between "train the index on the corpus" and "serve
  * searches from it". At 100 TB an index is trained ONCE (hours of
  * cluster time for the coarse k-means + residual codebooks) and then
  * consumed by every search job for weeks; keeping it as session-memo
  * state would force each job to retrain. The artifacts are plain
  * parquet + a JSON manifest, so any Spark job — or any other engine —
  * can open them:
  *
  * {{{
  *   <dir>/manifest.json              training parameters + row counts
  *   <dir>/coarse_centroids/          (label, dim, cval)   k·dim rows
  *   <dir>/codebook_<s>/              (label, dim, cval)   per subspace
  *   <dir>/codes/                     (vec_id, coarse, code_0..N, recon_d2)
  * }}}
  *
  * Scale shape: the centroid tables are k·dim rows (KBs at any corpus
  * size — they broadcast on load exactly as the in-session frames
  * did), while `codes` is one narrow row per corpus vector — the
  * compressed corpus, written with whatever parallelism the caller's
  * frame has, read back with partition pruning/pushdown like any
  * parquet table. Nothing is collected to the driver in either
  * direction.
  *
  * Determinism contract: parquet round-trips doubles and longs
  * bit-exactly, so a loaded index serves ADC searches byte-identical
  * to the freshly-trained one — `ann_ivf_pq_persist` grades that
  * end-to-end against the same DuckDB twin as `ann_ivf_pq`. */
object AnnIndexIO {

  /** Index parameters + shape, persisted alongside the artifacts so a
    * loader can refuse a mismatched index instead of serving silent
    * garbage (e.g. probing 8 subspaces of a 4-subspace index). */
  final case class Manifest(
      kind: String, // always "ivf-pq"
      subspaces: Int, // residual-PQ subspaces
      codebookK: Int, // centroids per subspace codebook
      coarseK: Int, // coarse IVF cells
      dim: Int, // full vector dimensionality
      nVectors: Long) // corpus rows in codes/

  /** A loaded index: the three artifact families as DataFrames, plus
    * the manifest they were trained under. `codebooks(s)` is the
    * subspace-s residual codebook. */
  final case class IvfPqIndex(
      manifest: Manifest,
      coarseCentroids: DataFrame,
      codebooks: IndexedSeq[DataFrame],
      codes: DataFrame)

  private def manifestJson(m: Manifest): String =
    s"""{"kind":"${m.kind}","subspaces":${m.subspaces},""" +
      s""""codebookK":${m.codebookK},"coarseK":${m.coarseK},""" +
      s""""dim":${m.dim},"nVectors":${m.nVectors}}"""

  /** Minimal flat-JSON field extraction — the manifest is written by
    * [[save]] with exactly one value per key, no nesting. */
  private def jsonField(json: String, key: String): String = {
    val m = java.util.regex.Pattern
      .compile("\"" + java.util.regex.Pattern.quote(key) + "\"\\s*:\\s*(\"([^\"]*)\"|[-0-9]+)")
      .matcher(json)
    require(m.find(), s"index manifest is missing field '$key': $json")
    if (m.group(2) != null) m.group(2) else m.group(1)
  }

  /** Persist a trained IVF-PQ index. `coarseCentroids` and each
    * codebook must be (label, dim, cval); `codes` must carry vec_id,
    * coarse and code_0..code_{subspaces-1} (extra columns — e.g. the
    * quantization-error audit — are kept). Overwrites any index
    * already at `dir`. */
  def save(dir: String, coarseCentroids: DataFrame,
      codebooks: Seq[DataFrame], codes: DataFrame,
      coarseK: Int, codebookK: Int, dim: Int): Unit = {
    require(codebooks.nonEmpty, "IVF-PQ index needs at least one subspace codebook")
    val codeCols = (0 until codebooks.size).map(s => s"code_$s")
    val missing = (Seq("vec_id", "coarse") ++ codeCols)
      .filterNot(codes.columns.contains)
    require(missing.isEmpty,
      s"codes frame is missing required columns: ${missing.mkString(", ")}")

    // centroid tables: k·dim rows — a single file reads back as one
    // broadcastable partition, matching how they're consumed
    coarseCentroids.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/coarse_centroids")
    codebooks.zipWithIndex.foreach { case (cb, s) =>
      cb.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/codebook_$s")
    }
    // the compressed corpus: written with the frame's own parallelism
    codes.write.mode(SaveMode.Overwrite).parquet(s"$dir/codes")
    // a stale tombstone set must not delete rows of a NEW index
    rmTreeJ(new java.io.File(s"$dir/tombstones"))

    val n = codes.sparkSession.read.parquet(s"$dir/codes").count()
    val m = Manifest("ivf-pq", codebooks.size, codebookK, coarseK, dim, n)
    Files.write(Paths.get(dir, "manifest.json"),
      manifestJson(m).getBytes(StandardCharsets.UTF_8)): Unit
  }

  /** Open a persisted index. Fails loudly on a missing/foreign
    * manifest or artifacts whose shape contradicts it — a search job
    * must never silently probe the wrong geometry. */
  def load(s: SparkSession, dir: String): IvfPqIndex = {
    val mPath = Paths.get(dir, "manifest.json")
    require(Files.exists(mPath), s"no index manifest at $dir/manifest.json")
    val json = new String(Files.readAllBytes(mPath), StandardCharsets.UTF_8)
    require(jsonField(json, "kind") == "ivf-pq",
      s"index at $dir is kind '${jsonField(json, "kind")}', expected 'ivf-pq'")
    val m = Manifest("ivf-pq",
      jsonField(json, "subspaces").toInt, jsonField(json, "codebookK").toInt,
      jsonField(json, "coarseK").toInt, jsonField(json, "dim").toInt,
      jsonField(json, "nVectors").toLong)
    require(m.subspaces > 0 && m.dim > 0,
      s"degenerate manifest at $dir: $m")

    val coarse = s.read.parquet(s"$dir/coarse_centroids")
    val books = (0 until m.subspaces)
      .map(sub => s.read.parquet(s"$dir/codebook_$sub"))
    // the LIVE view: tombstoned rows ([[remove]]) are anti-joined out
    val codes = liveCodes(s, dir)
    val codeCols = (0 until m.subspaces).map(i => s"code_$i")
    val missing = (Seq("vec_id", "coarse") ++ codeCols)
      .filterNot(codes.columns.contains)
    require(missing.isEmpty,
      s"index at $dir: codes is missing ${missing.mkString(", ")} — " +
        s"manifest declares ${m.subspaces} subspaces")
    IvfPqIndex(m, coarse, books.toIndexedSeq, codes)
  }

  /** Coarse centroids of a loaded index re-assembled as vectors
    * (label, cv: array<double>) — the broadcast side of residual
    * computation, same shape the in-session trainer memoizes. */
  def coarseCentVec(idx: IvfPqIndex): DataFrame =
    idx.coarseCentroids.groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("cval")))).as("dc"))
      .select(col("label").cast("long").as("label"),
        transform(col("dc"), _.getField("cval")).as("cv"))

  /** Encode NEW vectors against a loaded index — the daily-ingest
    * path of the train-once posture: fresh corpus arrivals get coarse
    * cell + residual PQ codes from the PERSISTED codebooks alone, no
    * retraining, no Memo'd session state. Per-vector and
    * embarrassingly parallel (two broadcast-centroid assignments and
    * a row-local residual), so it scales like a scan regardless of
    * how big the already-indexed corpus is. The arithmetic is
    * bit-identical to the trainer's own code assignment
    * (`ann_ivf_pq_encode` grades it against the full-index twin), so
    * encode-then-[[append]] equals having trained with those vectors
    * present — the property that makes incremental ingest sound.
    *
    * `vectors` must be (vec_id, v: array<double>) with v of
    * manifest.dim components (the [[graft.ext.Ann.prepared]] shape).
    * Returns (vec_id, coarse, code_0.., recon_d2) — the codes/ row
    * schema. */
  /** (label, vector) rows of a (label, dim, cval) centroid table,
    * collected to the driver sorted by label. Bounded by the index
    * GEOMETRY (k·dim doubles — KBs for any corpus), never by corpus
    * size: loading codebooks into memory is what every ANN serving
    * system does (FAISS holds them resident); the manifest validates
    * the shape before this runs. */
  private def collectCentroids(cent: DataFrame): Seq[(Long, Seq[Double])] =
    collectCentroidTables(Seq(cent)).head

  /** All centroid tables in ONE Spark job (a tagged union): encode
    * calls this for coarse + every subspace codebook, and 1 + nSub
    * separate KB-scale collect jobs were pure scheduling latency —
    * ~1.4 s of a 2.3 s sf0.1 encode rep. */
  private def collectCentroidTables(
      cents: Seq[DataFrame]): Seq[Seq[(Long, Seq[Double])]] = {
    val tagged = cents.zipWithIndex.map { case (c, i) =>
      c.select(lit(i).as("tbl"), col("label"), col("dim"), col("cval"))
    }.reduce(_ unionByName _)
    val rows = tagged.groupBy("tbl", "label")
      .agg(array_sort(collect_list(struct(col("dim"), col("cval")))).as("dc"))
      .select(col("tbl"), col("label").cast("long"),
        transform(col("dc"), _.getField("cval")))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
    cents.indices.map(i =>
      rows.filter(_._1 == i).map(t => (t._2, t._3)).sortBy(_._1).toSeq)
  }

  /** round(Σ (v[i]-c[i])², 4) to each centroid in `cents`, as one
    * row-local fold per centroid — the same dim-order, same rounding
    * arithmetic as the trainer's centroidDistances aggregate (whose
    * 64 exploded dim rows also sum in array order within one
    * partition), so assignments are bit-identical. */
  private def d2All(v: org.apache.spark.sql.Column, cents: Seq[Seq[Double]]) =
    array(cents.map(c =>
      round(aggregate(zip_with(v, typedLit(c), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x), 4)): _*)

  def encode(idx: IvfPqIndex, vectors: DataFrame): DataFrame = {
    val nSub = idx.manifest.subspaces
    val w = idx.manifest.dim / nSub
    // centroid tables → driver-side literals (geometry-bounded).
    // Each table is carried label-sorted, so the FIRST index of the
    // minimum distance is the lowest label — the trainer's exact
    // (d2 asc, label asc) tie-break — without assuming labels are
    // dense (an empty Lloyd's cluster drops its label).
    val collected = collectCentroidTables(
      idx.coarseCentroids +: (0 until nSub).map(idx.codebooks))
    val coarse = collected.head
    val books = collected.tail
    // ONE codegen'd scan, zero exchanges: the ingest hot path must
    // cost a linear pass at any already-indexed corpus size. The
    // original join formulation (posexplode → centroid join → groupBy
    // → rank window, per subspace) paid ~20 exchanges and 12.8 s for
    // 50k vectors at sf10; this pass is the plan a 1000-executor
    // ingest job wants.
    val cd2 = d2All(col("v"), coarse.map(_._2))
    val cpos = array_position(cd2, array_min(cd2)) // 1-based first-min
    val cvArr = typedLit(coarse.map(_._2))
    val cLabels = typedLit(coarse.map(_._1))
    val withCoarse = vectors.select(col("vec_id"), col("v"))
      .withColumn("coarse", element_at(cLabels, cpos.cast("int")))
      .withColumn("rv",
        zip_with(col("v"), element_at(cvArr, cpos.cast("int")), (a, b) => a - b))
    val withCodes = (0 until nSub).foldLeft(withCoarse) { (df, sub) =>
      val sd2 = d2All(slice(col("rv"), sub * w + 1, w), books(sub).map(_._2))
      val spos = array_position(sd2, array_min(sd2))
      df.withColumn(s"code_$sub",
          element_at(typedLit(books(sub).map(_._1)), spos.cast("int")))
        .withColumn(s"d2_$sub", element_at(sd2, spos.cast("int")))
    }
    val reconInt = (0 until nSub).map(sub =>
      (col(s"d2_$sub").cast("decimal(28,4)") * 10000).cast("long"))
      .reduce(_ + _)
    withCodes.select(col("vec_id") +: col("coarse") +:
      (0 until nSub).map(sub => col(s"code_$sub")) :+
      (reconInt.cast("double") / 10000.0).as("recon_d2"): _*)
  }

  /** Append freshly-encoded rows to a persisted index's code table
    * and refresh the manifest row count. The centroid artifacts are
    * immutable (they define the geometry); only codes/ grows — the
    * parquet-append is the same operation a 1000-executor ingest job
    * would run, with whatever parallelism `codes` carries. Callers
    * are responsible for vec_id disjointness (appending an existing
    * id duplicates it, as in any append-only table). */
  def append(dir: String, codes: DataFrame): Unit = {
    val m = readManifest(dir)
    val codeCols = (0 until m.subspaces).map(s => s"code_$s")
    val missing = (Seq("vec_id", "coarse") ++ codeCols)
      .filterNot(codes.columns.contains)
    require(missing.isEmpty,
      s"append to $dir: codes frame is missing ${missing.mkString(", ")}")
    codes.write.mode(SaveMode.Append).parquet(s"$dir/codes")
    val n = liveCodes(codes.sparkSession, dir).count()
    writeManifest(dir, m.copy(nVectors = n))
  }

  /** Mark vectors as DELETED without rewriting the code table — the
    * tombstone pattern every append-only index store uses (a 100 TB
    * code table is not rewritten because a take-down request removed
    * a document). `ids` (any frame with a vec_id column) appends to
    * `<dir>/tombstones/`; [[load]] anti-joins codes against it, so
    * every consumer — serve, recall, compact — sees the index WITHOUT
    * the removed vectors, at the cost of one broadcastable anti-join
    * per scan. [[compact]] folds tombstones into the files when the
    * debt is worth reclaiming. Removing an id that was never indexed
    * is a no-op by anti-join semantics; re-appending a tombstoned id
    * resurrects nothing (the tombstone wins until compaction drops
    * both). */
  def remove(dir: String, ids: DataFrame): Unit = {
    val m = readManifest(dir)
    require(ids.columns.contains("vec_id"),
      s"remove from $dir: ids frame has no vec_id column")
    ids.select(col("vec_id")).write.mode(SaveMode.Append)
      .parquet(s"$dir/tombstones")
    writeManifest(dir, m.copy(
      nVectors = liveCodes(ids.sparkSession, dir).count()))
  }

  /** Rewrite the code table without tombstoned rows and clear the
    * tombstones — the maintenance job that reclaims scan cost once
    * deletion debt accumulates. The rewrite keeps the live frame's
    * parallelism; centroid artifacts are untouched (geometry is
    * immutable). */
  def compact(spark: SparkSession, dir: String): Unit = {
    val m = readManifest(dir)
    if (Files.isDirectory(Paths.get(dir, "tombstones"))) {
      // localCheckpoint: the rewrite reads the files it overwrites
      val live = liveCodes(spark, dir).localCheckpoint(true)
      live.write.mode(SaveMode.Overwrite).parquet(s"$dir/codes")
      rmTreeJ(new java.io.File(s"$dir/tombstones"))
      writeManifest(dir, m.copy(nVectors = live.count()))
    }
  }

  /** codes minus tombstones (the live view every consumer gets). */
  private def liveCodes(spark: SparkSession, dir: String): DataFrame = {
    val codes = spark.read.parquet(s"$dir/codes")
    if (Files.isDirectory(Paths.get(dir, "tombstones")))
      codes.join(spark.read.parquet(s"$dir/tombstones"),
        Seq("vec_id"), "left_anti")
    else codes
  }

  private def readManifest(dir: String): Manifest = {
    val mPath = Paths.get(dir, "manifest.json")
    require(Files.exists(mPath), s"no index manifest at $dir/manifest.json")
    val json = new String(Files.readAllBytes(mPath), StandardCharsets.UTF_8)
    Manifest("ivf-pq",
      jsonField(json, "subspaces").toInt, jsonField(json, "codebookK").toInt,
      jsonField(json, "coarseK").toInt, jsonField(json, "dim").toInt,
      jsonField(json, "nVectors").toLong)
  }

  private def writeManifest(dir: String, m: Manifest): Unit =
    Files.write(Paths.get(dir, "manifest.json"),
      manifestJson(m).getBytes(StandardCharsets.UTF_8)): Unit

  private def rmTreeJ(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rmTreeJ)
    f.delete(): Unit
  }
}
