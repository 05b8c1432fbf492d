package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E3 — the full dedup "query" (engine.py:210-369) as one lazy
  * DataFrame composition, with the deterministic re-specifications of
  * SURVEY.md Appendix A:
  *
  *  - cluster_id = min(row_order) within the cluster (A.2)
  *  - per-row confidence = max pair-confidence over qualifying pairs
  *    where the row is the lower row_order; 0.70 default, 0.50 for
  *    empty base names (A.1); reason derived from the confidence
  *  - canonical tie-break = (count desc, length asc, base_name asc)
  *    (A.3)
  *
  * Name-level intermediates (stats, pairs, components, candidates)
  * are tiny relative to the row table, so every join back to rows is
  * AQE-broadcastable.
  *
  * Execution semantics: [[run]] is NOT fully lazy — the compact pair
  * projection and the CC edge set are eagerly materialized via
  * `localCheckpoint(true)` (the Jaro-Winkler pair join runs inside
  * this call, once, before the caller acts on the result). Local
  * checkpoints trade fault tolerance for lineage truncation: the
  * blocks live on executors with no recompute path, so an executor
  * loss between materialization and consumption fails the job instead
  * of recomputing. On a single-JVM deployment (this harness) that is
  * free; on a multi-executor cluster where mid-query executor loss
  * must be survivable, set `DedupSettings.checkpointDir` to durable
  * storage — every materialization in the pipeline then uses reliable
  * `checkpoint()` instead: same plan shape, one extra write, identical
  * results (ReliableCheckpointSpec). */
object Pipeline {

  /** Σ |block|·(|block|-1)/2 over the (materialized) name index —
    * one tiny aggregate job, the same estimate the driver fast path
    * and the governor sizing use. */
  private[dedup] def pairEstimate(stats: org.apache.spark.sql.DataFrame): Long = {
    // SQL `/` is double division — n·(n-1) is always even, so the
    // long cast after the halving is exact
    val r = stats.groupBy("block_key").agg(count(lit(1)).as("_n"))
      .agg(sum((col("_n") * (col("_n") - 1) / 2).cast("long"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Typed row of the pipeline output — for callers who want
    * compile-time field checks on the contract table. */
  case class DedupRecord(
      row_order: Long,
      original_name: String,
      normalized_name: String,
      base_name: String,
      block_key: String,
      cluster_id: Long,
      cluster_size: Long,
      canonical_name: String,
      confidence: Double,
      reason: String)

  /** Typed variant of [[run]]. */
  def runTyped(df: DataFrame, nameCol: String, rowOrderCol: String,
      settings: DedupSettings = DedupSettings()): org.apache.spark.sql.Dataset[DedupRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    run(df, nameCol, rowOrderCol, settings).as[DedupRecord]
  }

  /** Full derived output table:
    * (row_order, original_name, normalized_name, base_name, block_key,
    *  cluster_id, cluster_size, canonical_name, confidence, reason). */
  def run(df: DataFrame, nameCol: String, rowOrderCol: String,
      settings: DedupSettings = DedupSettings()): DataFrame =
    // spread the source before the normalize chain: a single-split
    // scan would run the 14-regex base-name derivation serially on
    // one core, twice (the stats build and the row-level confidence
    // join both read `derived`). Gated no-op at production split
    // counts; row_order is an explicit source key, so partitioning
    // never affects results (guide §2.4).
    runDerived(Normalize.withDerived(
      graft.core.Tables.spread(df, rowOrderCol), nameCol, rowOrderCol, settings),
      settings)

  /** [[run]] over an ALREADY-derived frame (any frame carrying the
    * five normalize output columns, e.g. a session-Memo'd
    * `Normalize.withDerived` materialization). The derivation must
    * have been produced with the SAME settings — the normalize chain
    * is settings-dependent (suffix folding, add-map), so a caller
    * holding a default-settings derived table may only pass
    * default settings here. Exists so a host that has already
    * materialized the derived table (the "normalize once, query the
    * derived table" pattern) does not re-pay the 14-regex chain
    * inside the pipeline — results are bit-identical because the
    * derivation is deterministic. */
  def runDerived(derivedFull: DataFrame,
      settings: DedupSettings = DedupSettings()): DataFrame = {
    val derived = derivedFull
      .select("row_order", "original_name", "normalized_name", "base_name", "block_key")

    val spark = derivedFull.sparkSession
    // reliable-checkpoint toggle (VERDICT r18 item 7): a set
    // checkpointDir switches every materialization below (and in
    // Matching/Cluster) from executor-local blocks to durable
    // checkpoint files — the multi-executor deployment path.
    settings.engageCheckpoints(spark)
    val reliable = settings.reliableCheckpoints
    // Name index materialized ONCE; every branch below (fast-path
    // sizing, pair join sides, row-level joins) reads the blocks.
    val stats = graft.core.Frames.materialize(Matching.nameStats(derived), reliable)

    // The pair join (the Jaro-Winkler work) has two consumers — the
    // CC edge set and the confidence candidates. Materializing the
    // full pair rows is off the table (a dense block makes them tens
    // of millions of WIDE rows — 6 GB at the 10×-scale stress test),
    // but the similarity compute itself must not run twice either
    // (round 2 paid a double JW pass here: once for the eager CC
    // build, once in the final DAG). Resolution: checkpoint ONLY the
    // compact (a_min_row, b_min_row, pair_conf) projection — 24
    // bytes/pair — and recover the name-level fields by joining back
    // to `stats` on min_row, which uniquely identifies a distinct
    // name (each row belongs to exactly one (block_key, base_name)
    // group, so group minima never collide). Small name indexes skip
    // all of it: Matching.driverPairsAndCandidates computes the same
    // (components, candidates) in one driver pass — bit-identical
    // results, ~6 fewer jobs (the Cluster.localEdgeCC philosophy
    // applied to the whole name-level stage).
    // lazy: the driver fast path never needs the estimate; the other
    // two branches share ONE aggregate job (the regime guard and the
    // CC gate both read it)
    lazy val impliedPairs = Pipeline.pairEstimate(stats)
    val (comps, crossCand) =
      Matching.driverPairsAndCandidates(stats, settings) match {
        case Some((compsLocal, candLocal)) =>
          import spark.implicits._
          Matching.recordStage("driver-fast-path", 1)
          (compsLocal.toDF("id", "component"),
            candLocal.toDF("cand_name", "cand_conf", "partner_max_row"))
        case None if impliedPairs > settings.densePairEstimate =>
          // DENSE regime (sf1+ supplier: a 10k-name near-clique is
          // 50M implied pairs): checkpointing the pair rows costs
          // gigabytes of storage + GC churn while the codegen'd JW
          // join recomputes in ~2 s — so never materialize pairs;
          // push both consumers down to aggregates over the streamed
          // join (one shared pass + one verification pass per CC
          // round). See Matching.denseAggregatedStage.
          Matching.denseAggregatedStage(stats, settings)
        case None =>
          Matching.recordStage("materialize", 1)
          val pairsCompact = graft.core.Frames.materialize(
            Matching.qualifyingPairsPrepared(stats, settings)
              .select(col("a_min_row"), col("b_min_row"), col("pair_conf")),
            reliable)
          // --- C1 (distributed): node id = the name's min_row, so a
          // component id IS min(row_order) in-cluster. The edge set is
          // a projection of the compact checkpoint — already
          // materialized, so CC must not copy it again
          // (edgesMaterialized: on the sf1 supplier clique that copy
          // was ~2 GB of storage and seconds of wall per run).
          val edges = pairsCompact
            .select(col("a_min_row").as("src"), col("b_min_row").as("dst"))
          // edgeCountHint: qualifying pairs ⊆ implied pairs, so the
          // Σ C(block,2) estimate is a valid upper bound — when it
          // already fits the driver, CC skips the pre-contraction
          // constant outright (VERDICT r15 item 1)
          val compsDist = Cluster.connectedComponents(edges,
            edgesMaterialized = true, edgeCountHint = impliedPairs,
            reliable = reliable)
          // name fields recovered from the compact checkpoint: AQE
          // turns both min_row joins into broadcasts (the name index
          // is tiny relative to pairs), so this costs two map-side
          // probes of already-computed conf rows, not a second
          // similarity join.
          val nameByMin = stats.select(col("min_row"), col("base_name"), col("max_row"))
          val rejoined = pairsCompact
            .join(nameByMin.select(col("min_row").as("a_min_row"),
              col("base_name").as("a_name"), col("max_row").as("a_max_row")), Seq("a_min_row"))
            .join(nameByMin.select(col("min_row").as("b_min_row"),
              col("base_name").as("b_name"), col("max_row").as("b_max_row")), Seq("b_min_row"))
          val crossDist = rejoined.select(col("a_name").as("cand_name"),
              col("pair_conf").as("cand_conf"), col("b_max_row").as("partner_max_row"))
            .union(rejoined.select(col("b_name"), col("pair_conf"), col("a_max_row")))
            // exact O(pairs) -> O(names) reduction: for a (name, conf)
            // only the FURTHEST partner matters — `partner_max_row >
            // row_order` holds for some candidate iff it holds for the
            // max. Collapses the candidate join input from |pairs|·2
            // to ≤ 3 rows per name.
            .groupBy("cand_name", "cand_conf")
            .agg(max(col("partner_max_row")).as("partner_max_row"))
          (compsDist, crossDist)
      }

    val nameCluster = stats
      .join(comps.withColumnRenamed("id", "min_row"), Seq("min_row"), "left")
      .select(col("base_name"),
        coalesce(col("component"), col("min_row")).as("cluster_id"))

    // --- A.1 confidence candidates at name level: a name's rows can
    // claim pair_conf if a partner row with a higher row_order exists.
    val selfCand = stats.filter(col("n_rows") >= 2)
      .select(col("base_name").as("cand_name"),
        lit(Rules.ConfTokenAndRatio).as("cand_conf"),
        col("max_row").as("partner_max_row"))
    val candidates = selfCand.union(crossCand)

    val withConf = derived
      .join(candidates,
        derived("base_name") === candidates("cand_name") &&
          candidates("partner_max_row") > derived("row_order"),
        "left")
      .groupBy("row_order", "original_name", "normalized_name", "base_name", "block_key")
      .agg(max(col("cand_conf")).as("max_cand_conf"))
      .withColumn("confidence",
        when(col("base_name") === "", lit(Rules.ConfEmptyBase))
          .otherwise(coalesce(col("max_cand_conf"), lit(Rules.ConfDefault))))
      .drop("max_cand_conf")

    // --- cluster assignment: empty-base rows are forced singletons.
    val clustered = withConf
      .join(nameCluster, Seq("base_name"), "left")
      .withColumn("cluster_id",
        coalesce(col("cluster_id"), col("row_order")))

    // --- A1/A2: canonical election (mode, tie → shortest, then asc)
    // + cluster size, as windows sharing ONE shuffle by cluster_id
    // instead of two aggregate+join round-trips. Empty-base rows are
    // always singleton clusters (they never enter blocking), so
    // within any multi-row cluster every base_name is non-empty and
    // the vote ordering needs no empty-name guard.
    val voteW = Window.partitionBy("cluster_id", "base_name")
    val clusterW = Window.partitionBy("cluster_id")
    val electW = clusterW.orderBy(
      col("votes").desc, length(col("base_name")).asc, col("base_name").asc)

    clustered
      .withColumn("votes", count(lit(1)).over(voteW))
      .withColumn("cluster_size", count(lit(1)).over(clusterW))
      .withColumn("elected_name", first(col("base_name")).over(electW))
      .withColumn("canonical_name",
        when(col("base_name") === "", col("normalized_name"))
          .otherwise(col("elected_name")))
      .withColumn("reason",
        when(col("confidence") === Rules.ConfEmptyBase, lit(Rules.ReasonEmptyBase))
          .when(col("confidence") === Rules.ConfTokenAndRatio, lit(Rules.ReasonTokenAndRatio))
          .when(col("confidence") === Rules.ConfHardRatio, lit(Rules.ReasonHardRatio))
          .when(col("confidence") === Rules.ConfSoftRatio, lit(Rules.ReasonSoftRatio))
          .otherwise(lit(Rules.ReasonDefault)))
      .select("row_order", "original_name", "normalized_name", "base_name",
        "block_key", "cluster_id", "cluster_size", "canonical_name",
        "confidence", "reason")
  }
}
