package graft.queries

import graft.core.Tables
import graft.dedup._
import graft.oracle.Sql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract queries for the dedup pipeline core (SURVEY.md
  * §2.1). Each entry returns a deterministic, totally-ordered
  * DataFrame and has a DuckDB twin in [[oracle]]. */
object DedupQueries {

  /** part is the dedup workhorse: heavy exact duplication (64 distinct
    * names at any sf) exercises the distinct-name optimization;
    * supplier (all-unique, pairwise-similar names) exercises the dense
    * pair join.
    *
    * The derived tables are Memo'd (like the pipeline table): the
    * base_name derivation is a 14-regex fixpoint chain, and any filter
    * or re-reference Catalyst pushes through the derivation re-inlines
    * the whole chain into the pushed predicate — filter predicates get
    * no subexpression elimination, so `filter(base_name <> '')` alone
    * re-pays ~2 chain evaluations per row (measured 6.4× on
    * dedup_blocking at sf0.1). Materializing once per session turns
    * every consumer into a cached-column scan; at production scale this
    * is the "normalize the corpus once, write it out, query the
    * derived table" pattern, with MEMORY_AND_DISK spill instead of
    * recompute. */
  private def derivedPart(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"dedup_derived:part:$dir", truncate = true) {
      // Tables.spread: a single-split scan runs the 14-regex chain
      // serially on one core otherwise (guide §2.4; gated no-op at
      // production split counts) — same for the two tables below
      Normalize.withDerived(
        Tables.spread(Tables.part(s, dir), "p_partkey"), "p_name", "p_partkey")
    }

  private def derivedSupplier(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"dedup_derived:supplier:$dir", truncate = true) {
      Normalize.withDerived(
        Tables.spread(Tables.supplier(s, dir), "s_suppkey"), "s_name", "s_suppkey")
    }

  private def derivedCustomer(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"dedup_derived:customer:$dir", truncate = true) {
      Normalize.withDerived(
        Tables.spread(Tables.customer(s, dir), "c_custkey"), "c_name", "c_custkey")
    }

  /** The pipeline table is shared by six report queries — memoize the
    * materialization per session (one run + cache, then projections). */
  private def fullPart(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"dedup_full:$dir", truncate = true) {
      // consume the Memo'd derived table (same default settings)
      // instead of re-deriving inside the pipeline: the warm's four
      // parallel builds then share ONE 14-regex normalize pass over
      // part — the fullPart thread blocks on derivedPart's future and
      // proceeds, rather than racing a duplicate derivation
      Pipeline.runDerived(derivedPart(s, dir))
    }

  /** The distinct-name index feeds every pair query over its table
    * (customer: stats/capped/governor/sorted; supplier: pairs/
    * smallblock) — Memo it once per session instead of re-deriving
    * and re-checkpointing it per query AND per bench repetition. The
    * frame is one row per distinct name: small at any scale, and
    * exactly what qualifyingPairsPrepared expects as its
    * already-materialized input. */
  private def customerNameStats(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"dedup_nameidx:customer:$dir", truncate = true) {
      Matching.nameStats(derivedCustomer(s, dir))
    }

  private def supplierNameStats(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(s, s"dedup_nameidx:supplier:$dir", truncate = true) {
      Matching.nameStats(derivedSupplier(s, dir))
    }

  /** Materialize the session-shared pipeline + derived tables (bench
    * warm-up hook — see TextQueries.warmIndexes). */
  def warmIndexes(s: SparkSession, dir: String): Unit = {
    // The four builds are independent Memo keys, and Memo's per-key
    // locking runs different keys as genuinely concurrent Spark jobs.
    // Run them in parallel: the pipeline build has driver-side phases
    // (union-find over the collected min edges, election window
    // planning) during which executors idle — the three derived-table
    // regex scans fill those gaps instead of queueing behind them.
    graft.core.Par.run(Seq(
      () => fullPart(s, dir).count(): Unit,
      () => derivedPart(s, dir).count(): Unit,
      () => derivedSupplier(s, dir).count(): Unit,
      () => derivedCustomer(s, dir).count(): Unit))
  }

  /** dedup_governed_recall geometry, shared verbatim by the twin:
    * cap/window match dedup_pairs_capped's governed policy; blocks
    * above the audit bound are counted, never enumerated (a 150k-name
    * sf1 block would be 11G counterfactual pairs). */
  private val GovRecallCap = 1000L
  private val GovRecallWindow = 10
  private val GovAuditBlockMax = 20000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1-F5 + K1: full derived-column contract, row-level.
    "dedup_normalize" -> ((s, dir) =>
      derivedPart(s, dir)
        .select("row_order", "original_name", "normalized_name", "base_name", "block_key")
        .orderBy("row_order")),

    // B1: blocking as a key-grouped aggregation (the join key design,
    // SURVEY.md §4) — block populations and distinct-name counts.
    "dedup_blocking" -> ((s, dir) =>
      derivedPart(s, dir)
        .filter(col("base_name") =!= "")
        .groupBy("block_key")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("base_name")).as("n_names"),
          min(col("row_order")).as("min_row"))
        .orderBy("block_key")),

    // J1+M1+M2+C2: qualifying pairs on supplier — all-distinct,
    // pairwise-similar names make this a dense Jaro-Winkler join, the
    // numeric-parity stress test against DuckDB's implementation.
    "dedup_pairs" -> ((s, dir) =>
      Matching.qualifyingPairsPrepared(supplierNameStats(s, dir))
        .select("a_name", "b_name", "ratio", "token_match", "pair_conf")
        .orderBy("a_name", "b_name")),

    // J1 under an sf1-gradable bound: identical qualifying-pair
    // semantics, restricted to blocks holding <= 1000 distinct names.
    // The unbounded dedup_pairs twin is oracle-infeasible at sf1 (the
    // scaled supplier block is 9000 names -> 40.5M SQL JW pairs), so
    // THIS query is what the 10x sweep grades for the pair join: at
    // sf0.1 and below it covers every supplier block (bit-identical
    // surface to dedup_pairs); at sf1 it pins the small-block subset
    // while the capped/sorted twins pin the governed path.
    "dedup_pairs_smallblock" -> ((s, dir) => {
      val stats = supplierNameStats(s, dir)
      val bn = org.apache.spark.sql.expressions.Window.partitionBy("block_key")
      val small = stats.withColumn("_bn", count(lit(1)).over(bn))
        .filter(col("_bn") <= 1000).drop("_bn")
      Matching.qualifyingPairsPrepared(small.localCheckpoint(true))
        .select("a_name", "b_name", "ratio", "token_match", "pair_conf")
        .orderBy("a_name", "b_name")
    }),

    // J1 at adversarial scale: customer names are all-distinct and
    // land in ONE block (15k names -> 112M pairs at sf0.1). The
    // salted pair join spreads the quadratic work across cores;
    // output is the aggregate profile.
    "dedup_pairs_stats" -> ((s, dir) =>
      Matching.pairProfile(customerNameStats(s, dir))),

    // J1 over a deterministic md5 name sample (VERDICT r17 item 5 —
    // the text_lsh_pairs_sample pattern applied to the JW pair join):
    // the unbounded dedup_pairs twin is oracle-infeasible at sf1
    // (~40M SQL JW pairs AND a quadratic output), so this query runs
    // the IDENTICAL qualifying-pair path over the 1/16 of distinct
    // supplier names whose md5 starts with '0' — full pair semantics
    // on the restricted name set, which DuckDB affords at sf1
    // (~560 names -> ~160k JW pairs). md5-bucketing (not a range
    // predicate) keeps the sample spread across every block. The
    // default block-name cap (50k) provably never fires on a 1/16
    // sample at graded scales, so the twin needs no governor mirror.
    "dedup_pairs_sample" -> ((s, dir) =>
      Matching.qualifyingPairsPrepared(
        supplierNameStats(s, dir)
          .filter(substring(md5(col("base_name")), 1, 1) === "0"))
        .select("a_name", "b_name", "ratio", "token_match", "pair_conf")
        .orderBy("a_name", "b_name")),

    // the aggregate-profile sibling over the adversarial one-block
    // customer table: 4/256 of distinct names (md5 prefix <= '03') —
    // sf1's 150k-name block samples to ~2.3k names / ~2.7M SQL JW
    // pairs, affordable for the twin while still quadratic-shaped on
    // the Spark side (same salted pair join, one block).
    "dedup_pairs_stats_sample" -> ((s, dir) =>
      Matching.pairProfile(
        customerNameStats(s, dir)
          .filter(substring(md5(col("base_name")), 1, 2) <= "03"))),

    // the cost governor end-to-end (default-on policy, here with a
    // deliberately small cap so the governed path is oracle-visible):
    // blocks over the cap switch to sorted-neighborhood pairing,
    // blocks under it keep full reference pairing.
    "dedup_pairs_capped" -> ((s, dir) =>
      Matching.qualifyingPairsPrepared(customerNameStats(s, dir),
        DedupSettings(maxBlockNames = Some(1000L), hotBlockWindow = 10))
        .select("a_name", "b_name", "ratio", "token_match", "pair_conf")
        .orderBy("a_name", "b_name")),

    // the governor's divergence report: how many blocks (and names)
    // ran under the hot-block policy instead of exact reference
    // pairing — same cap as dedup_pairs_capped so the governed path
    // is non-trivially exercised.
    "dedup_governor" -> ((s, dir) =>
      Matching.governorStats(customerNameStats(s, dir),
        DedupSettings(maxBlockNames = Some(1000L)))),

    // sorted-neighborhood blocking: the O(n·w) alternative for
    // all-distinct hot blocks — each name compared to its 4 sorted
    // successors only.
    "dedup_pairs_sorted" -> ((s, dir) =>
      Matching.sortedNeighborhoodPairs(customerNameStats(s, dir),
        window = 5)
        .select("a_name", "b_name", "ratio", "token_match", "pair_conf")
        .orderBy("a_name", "b_name")),

    // the governor's recall audit (VERDICT r18 item 4 — the
    // mm_neardup_recall pattern applied to the name pipeline): how
    // many qualifying pairs does the sorted-neighborhood hot-block
    // policy LOSE against full reference pairing? Over-cap blocks up
    // to GovAuditBlockMax names are enumerated exactly (full pairing
    // = the bounded uncapped counterfactual); larger blocks are
    // counted, not enumerated, and recall_audited goes NULL (an
    // upper bound must not read as a measurement — the mm recall
    // lesson, ADVICE r18 item 3). Under-cap blocks run identically
    // under both policies, so the audit scopes to governed blocks
    // only: the number IS the policy's loss, undiluted. No governed
    // blocks at all -> vacuous recall 1.0.
    "dedup_governed_recall" -> ((s, dir) => {
      val stats = customerNameStats(s, dir)
      val bn = org.apache.spark.sql.expressions.Window.partitionBy("block_key")
      val audited = stats.withColumn("_bn", count(lit(1)).over(bn))
        .filter(col("_bn") > GovRecallCap && col("_bn") <= GovAuditBlockMax)
        .drop("_bn").localCheckpoint(true)
      // kept ⊆ all by construction — the window policy emits a subset
      // of full pairing's qualifying pairs (same predicate, same
      // distinct-name level, each unordered pair generated once, a<b
      // canonical, and a name belongs to exactly one block) — so
      // n_dropped = n_all − n_kept with no pair-level anti-join. The
      // r19 shape materialized ~every qualifying pair of the 15k-name
      // block (≈100M two-string rows) through an Exchange+Sort just to
      // count the difference, and its row-returning pair paths inline
      // Jaro-Winkler twice per pair in the join residual; both counts
      // now run through pairProfile's single-JW-eval conditional
      // aggregation (13.5 s → ~2.1 s at sf0.1, plan: SortMergeJoin
      // LeftAnti gone, 12 → 10 exchanges, JW only in Project outputs,
      // never in a join residual). The audited set holds ONLY
      // over-cap blocks, so the capped profile's small-block branch is
      // empty and its n_pairs is exactly the sorted-neighborhood kept
      // count; the DuckDB twin keeps the explicit kept/allp/EXCEPT
      // form and grades the identity.
      val aggKept = Matching.pairProfile(audited,
        DedupSettings(maxBlockNames = Some(GovRecallCap),
          hotBlockWindow = GovRecallWindow))
        .select(col("n_pairs").as("n_kept"))
      val aggDropped = Matching.pairProfile(audited,
        DedupSettings(maxBlockNames = None))
        .select(col("n_pairs").as("n_all"))
      val aggBlocks = stats.groupBy("block_key").agg(count(lit(1)).as("n"))
        .agg(
          coalesce(sum(when(col("n") > GovRecallCap, 1L).otherwise(0L)), lit(0L))
            .as("n_governed_blocks"),
          coalesce(sum(when(col("n") > GovAuditBlockMax, 1L).otherwise(0L)), lit(0L))
            .as("n_unaudited_blocks"))
      aggKept.crossJoin(aggDropped).crossJoin(aggBlocks)
        .select(col("n_kept"), (col("n_all") - col("n_kept")).as("n_dropped"),
          col("n_governed_blocks"), col("n_unaudited_blocks"),
          when(col("n_unaudited_blocks") > 0, lit(null))
            .when(col("n_all") === 0, lit(1.0))
            .otherwise(round(col("n_kept") / col("n_all"), 6))
            .as("recall_audited"))
    }),

    // C1: row -> cluster assignment (cluster_id = min row_order).
    "dedup_clusters" -> ((s, dir) =>
      fullPart(s, dir).select("row_order", "cluster_id").orderBy("row_order")),

    // C1 on a dense similarity graph: supplier names are pairwise
    // ~0.97-similar, so the name graph is a near-clique — the CC loop
    // converges on a single giant component.
    "dedup_clusters_supplier" -> ((s, dir) =>
      // consume the Memo'd derived table (same default settings) —
      // the Pipeline.runDerived treatment fullPart gets: the timed
      // path keeps the dense JW join + closure + election, and stops
      // re-paying the per-row regex derivation every repetition
      Pipeline.runDerived(derivedSupplier(s, dir))
        .select("row_order", "cluster_id", "cluster_size", "confidence")
        .orderBy("row_order")),

    // the dense-regime pipeline over a deterministic md5 name sample
    // (VERDICT r18 item 3 — the last sf1 oracle skip): the full
    // supplier twin's recursive closure over a ~10k-name near-clique
    // (40M+ SQL JW pairs) is oracle-infeasible at sf1, so this runs
    // the IDENTICAL Pipeline.run path over the 1/16 of supplier ROWS
    // whose name-md5 starts with '0' — same normalize/block/match/
    // CC/elect stages, same dense near-clique shape (every sampled
    // name still pairs with every other), at a twin-affordable size
    // (~625 names -> ~190k SQL JW pairs at sf1).
    "dedup_clusters_supplier_sample" -> ((s, dir) =>
      // row filter commutes with the per-row derivation
      // (original_name IS s_name cast to string), so filtering the
      // Memo'd derived table is exactly restriction-then-pipeline —
      // the twin's order — without re-deriving per repetition
      Pipeline.runDerived(derivedSupplier(s, dir)
          .filter(substring(md5(col("original_name")), 1, 1) === "0"))
        .select("row_order", "cluster_id", "cluster_size", "confidence")
        .orderBy("row_order")),

    // the settings surface: stricter thresholds + folding disabled +
    // a user acronym override, end-to-end.
    "dedup_full_strict" -> ((s, dir) => {
      val settings = DedupSettings(hardThreshold = 0.95, softThreshold = 0.92,
        noSubsidiaryFold = true, addMap = Map("SPRING BOLT" -> "BOLT OF SPRING"))
      Outputs.clusters(Pipeline.run(Tables.part(s, dir), "p_name", "p_partkey", settings))
    }),

    // E3: the full pipeline contract table (sheet `clusters`).
    "dedup_full" -> ((s, dir) => Outputs.clusters(fullPart(s, dir))),

    // golden mapping (original -> canonical), per row.
    "dedup_mapping" -> ((s, dir) => Outputs.mapping(fullPart(s, dir))),

    // A3: canonical summary.
    "dedup_summary" -> ((s, dir) => Outputs.summary(fullPart(s, dir))),

    // T1: high-confidence review subset.
    "dedup_review" -> ((s, dir) => Outputs.review(fullPart(s, dir))),

    // A4: scalar stats.
    "dedup_stats" -> ((s, dir) => Outputs.stats(fullPart(s, dir))),

    // O2: settings echo (literal table).
    "dedup_settings" -> ((s, _) => Outputs.settingsEcho(s, DedupSettings())),

    // W3 (pure part): keyword industry classification over distinct
    // canonical names.
    "enrich_industry" -> ((s, dir) => {
      val keywordCase = Rules.IndustryKeywords.foldRight(
        when(lit(false), lit("")).otherwise(lit("Diversified/Other"))) {
        case ((industry, keys), elseExpr) =>
          when(keys.map(k => col("canonical_name").contains(k)).reduce(_ || _),
            lit(industry)).otherwise(elseExpr)
      }
      fullPart(s, dir)
        .select("canonical_name").distinct()
        .withColumn("industry",
          when(col("canonical_name") === "", lit("Unknown")).otherwise(keywordCase))
        .orderBy("canonical_name")
    })
  )

  private val partPipeline = Sql.dedupPipelineCte("part", "p_partkey", "p_name")

  val oracle: Map[String, String] = Map(
    "dedup_normalize" ->
      s"""${Sql.derivedCte("part", "p_partkey", "p_name")}
         |SELECT row_order, original_name, normalized_name, base_name, block_key
         |FROM derived ORDER BY row_order""".stripMargin,

    "dedup_blocking" ->
      s"""${Sql.derivedCte("part", "p_partkey", "p_name")}
         |SELECT block_key, count(*) AS n_rows,
         |       count(DISTINCT base_name) AS n_names,
         |       min(row_order) AS min_row
         |FROM derived WHERE base_name <> ''
         |GROUP BY block_key ORDER BY block_key""".stripMargin,

    "dedup_pairs" ->
      s"""${Sql.derivedCte("supplier", "s_suppkey", "s_name")},
         |stats AS (
         |  SELECT block_key, base_name, count(*) AS n_rows,
         |         min(row_order) AS min_row, max(row_order) AS max_row
         |  FROM derived WHERE base_name <> '' GROUP BY 1, 2
         |)
         |SELECT a.base_name AS a_name, b.base_name AS b_name,
         |       jaro_winkler_similarity(a.base_name, b.base_name) AS ratio,
         |       (${Sql.tokenKey("a.base_name")} = ${Sql.tokenKey("b.base_name")}) AS token_match,
         |       ${Sql.pairConf("jaro_winkler_similarity(a.base_name, b.base_name)",
                s"(${Sql.tokenKey("a.base_name")} = ${Sql.tokenKey("b.base_name")})")} AS pair_conf
         |FROM stats a JOIN stats b
         |  ON a.block_key = b.block_key AND a.base_name < b.base_name
         |WHERE ((${Sql.tokenKey("a.base_name")} = ${Sql.tokenKey("b.base_name")})
         |       AND jaro_winkler_similarity(a.base_name, b.base_name) >= 0.85)
         |   OR jaro_winkler_similarity(a.base_name, b.base_name) >= 0.90
         |ORDER BY a_name, b_name""".stripMargin,

    "dedup_pairs_smallblock" ->
      s"""${Sql.derivedCte("supplier", "s_suppkey", "s_name")},
         |stats AS (
         |  SELECT block_key, base_name, count(*) AS n_rows,
         |         min(row_order) AS min_row, max(row_order) AS max_row
         |  FROM derived WHERE base_name <> '' GROUP BY 1, 2
         |), sizes AS (
         |  SELECT block_key, count(*) AS bn FROM stats GROUP BY 1
         |), small AS (
         |  SELECT s.* FROM stats s JOIN sizes z USING (block_key) WHERE z.bn <= 1000
         |)
         |SELECT a.base_name AS a_name, b.base_name AS b_name,
         |       jaro_winkler_similarity(a.base_name, b.base_name) AS ratio,
         |       (${Sql.tokenKey("a.base_name")} = ${Sql.tokenKey("b.base_name")}) AS token_match,
         |       ${Sql.pairConf("jaro_winkler_similarity(a.base_name, b.base_name)",
                s"(${Sql.tokenKey("a.base_name")} = ${Sql.tokenKey("b.base_name")})")} AS pair_conf
         |FROM small a JOIN small b
         |  ON a.block_key = b.block_key AND a.base_name < b.base_name
         |WHERE ((${Sql.tokenKey("a.base_name")} = ${Sql.tokenKey("b.base_name")})
         |       AND jaro_winkler_similarity(a.base_name, b.base_name) >= 0.85)
         |   OR jaro_winkler_similarity(a.base_name, b.base_name) >= 0.90
         |ORDER BY a_name, b_name""".stripMargin,

    "dedup_pairs_stats" ->
      s"""${Sql.derivedCte("customer", "c_custkey", "c_name")},
         |stats AS (
         |  SELECT block_key, base_name,
         |         ${Sql.tokenKey("base_name")} AS token_key
         |  FROM derived WHERE base_name <> '' GROUP BY 1, 2, 3
         |), pairs AS (
         |  SELECT jaro_winkler_similarity(a.base_name, b.base_name) AS ratio,
         |         (a.token_key = b.token_key) AS token_match
         |  FROM stats a JOIN stats b
         |    ON a.block_key = b.block_key AND a.base_name < b.base_name
         |)
         |SELECT count(*) AS n_pairs,
         |       CAST(sum(CASE WHEN token_match THEN 1 ELSE 0 END) AS BIGINT) AS n_token_matches,
         |       round(avg(ratio), 6) AS avg_ratio
         |FROM pairs
         |WHERE (token_match AND ratio >= 0.85) OR ratio >= 0.90""".stripMargin,

    "dedup_pairs_sample" ->
      s"""${Sql.derivedCte("supplier", "s_suppkey", "s_name")},
         |stats AS (
         |  SELECT block_key, base_name, count(*) AS n_rows,
         |         min(row_order) AS min_row, max(row_order) AS max_row
         |  FROM derived
         |  WHERE base_name <> '' AND substr(md5(base_name), 1, 1) = '0'
         |  GROUP BY 1, 2
         |)
         |SELECT a.base_name AS a_name, b.base_name AS b_name,
         |       jaro_winkler_similarity(a.base_name, b.base_name) AS ratio,
         |       (${Sql.tokenKey("a.base_name")} = ${Sql.tokenKey("b.base_name")}) AS token_match,
         |       ${Sql.pairConf("jaro_winkler_similarity(a.base_name, b.base_name)",
                s"(${Sql.tokenKey("a.base_name")} = ${Sql.tokenKey("b.base_name")})")} AS pair_conf
         |FROM stats a JOIN stats b
         |  ON a.block_key = b.block_key AND a.base_name < b.base_name
         |WHERE ((${Sql.tokenKey("a.base_name")} = ${Sql.tokenKey("b.base_name")})
         |       AND jaro_winkler_similarity(a.base_name, b.base_name) >= 0.85)
         |   OR jaro_winkler_similarity(a.base_name, b.base_name) >= 0.90
         |ORDER BY a_name, b_name""".stripMargin,

    "dedup_pairs_stats_sample" ->
      s"""${Sql.derivedCte("customer", "c_custkey", "c_name")},
         |stats AS (
         |  SELECT block_key, base_name,
         |         ${Sql.tokenKey("base_name")} AS token_key
         |  FROM derived
         |  WHERE base_name <> '' AND substr(md5(base_name), 1, 2) <= '03'
         |  GROUP BY 1, 2, 3
         |), pairs AS (
         |  SELECT jaro_winkler_similarity(a.base_name, b.base_name) AS ratio,
         |         (a.token_key = b.token_key) AS token_match
         |  FROM stats a JOIN stats b
         |    ON a.block_key = b.block_key AND a.base_name < b.base_name
         |)
         |SELECT count(*) AS n_pairs,
         |       CAST(sum(CASE WHEN token_match THEN 1 ELSE 0 END) AS BIGINT) AS n_token_matches,
         |       round(avg(ratio), 6) AS avg_ratio
         |FROM pairs
         |WHERE (token_match AND ratio >= 0.85) OR ratio >= 0.90""".stripMargin,

    "dedup_pairs_capped" ->
      s"""${Sql.derivedCte("customer", "c_custkey", "c_name")},
         |stats AS (
         |  SELECT block_key, base_name,
         |         ${Sql.tokenKey("base_name")} AS token_key
         |  FROM derived WHERE base_name <> '' GROUP BY 1, 2, 3
         |), sizes AS (
         |  SELECT block_key, count(*) AS bn FROM stats GROUP BY 1
         |), small AS (
         |  SELECT s.* FROM stats s JOIN sizes z USING (block_key) WHERE z.bn <= 1000
         |), hot AS (
         |  SELECT s.*, row_number() OVER (PARTITION BY s.block_key
         |    ORDER BY s.base_name) AS rnk
         |  FROM stats s JOIN sizes z USING (block_key) WHERE z.bn > 1000
         |), pairs AS (
         |  SELECT a.base_name AS a_name, b.base_name AS b_name,
         |         jaro_winkler_similarity(a.base_name, b.base_name) AS ratio,
         |         (a.token_key = b.token_key) AS token_match
         |  FROM small a JOIN small b
         |    ON a.block_key = b.block_key AND a.base_name < b.base_name
         |  UNION ALL
         |  SELECT a.base_name, b.base_name,
         |         jaro_winkler_similarity(a.base_name, b.base_name),
         |         (a.token_key = b.token_key)
         |  FROM hot a JOIN hot b
         |    ON a.block_key = b.block_key AND b.rnk BETWEEN a.rnk + 1 AND a.rnk + 9
         |)
         |SELECT a_name, b_name, ratio, token_match,
         |       ${Sql.pairConf("ratio", "token_match")} AS pair_conf
         |FROM pairs
         |WHERE (token_match AND ratio >= 0.85) OR ratio >= 0.90
         |ORDER BY a_name, b_name""".stripMargin,

    "dedup_governor" ->
      s"""${Sql.derivedCte("customer", "c_custkey", "c_name")},
         |stats AS (
         |  SELECT block_key, base_name FROM derived
         |  WHERE base_name <> '' GROUP BY 1, 2
         |), sizes AS (
         |  SELECT block_key, count(*) AS n_names FROM stats GROUP BY 1
         |)
         |SELECT count(*) AS total_blocks,
         |       CAST(coalesce(sum(CASE WHEN n_names > 1000 THEN 1 ELSE 0 END), 0) AS BIGINT)
         |         AS governed_blocks,
         |       CAST(coalesce(sum(CASE WHEN n_names > 1000 THEN n_names ELSE 0 END), 0) AS BIGINT)
         |         AS governed_names
         |FROM sizes""".stripMargin,

    "dedup_pairs_sorted" ->
      s"""${Sql.derivedCte("customer", "c_custkey", "c_name")},
         |stats AS (
         |  SELECT block_key, base_name,
         |         ${Sql.tokenKey("base_name")} AS token_key,
         |         row_number() OVER (PARTITION BY block_key ORDER BY base_name) AS rnk
         |  FROM derived WHERE base_name <> '' GROUP BY 1, 2, 3
         |), pairs AS (
         |  SELECT a.base_name AS a_name, b.base_name AS b_name,
         |         jaro_winkler_similarity(a.base_name, b.base_name) AS ratio,
         |         (a.token_key = b.token_key) AS token_match
         |  FROM stats a JOIN stats b
         |    ON a.block_key = b.block_key
         |   AND b.rnk BETWEEN a.rnk + 1 AND a.rnk + 4
         |)
         |SELECT a_name, b_name, ratio, token_match,
         |       ${Sql.pairConf("ratio", "token_match")} AS pair_conf
         |FROM pairs
         |WHERE (token_match AND ratio >= 0.85) OR ratio >= 0.90
         |ORDER BY a_name, b_name""".stripMargin,

    // the recall-audit twin: same stats/sizes shape as the capped
    // twin; `hot` is the audited governed slice (cap < bn <= audit
    // bound), kept = the window policy, allp = full pairing, dropped
    // = allp EXCEPT kept (both relations are canonically a<b
    // oriented, so EXCEPT is exact).
    "dedup_governed_recall" ->
      s"""${Sql.derivedCte("customer", "c_custkey", "c_name")},
         |stats AS (
         |  SELECT block_key, base_name,
         |         ${Sql.tokenKey("base_name")} AS token_key
         |  FROM derived WHERE base_name <> '' GROUP BY 1, 2, 3
         |), sizes AS (
         |  SELECT block_key, count(*) AS bn FROM stats GROUP BY 1
         |), hot AS (
         |  SELECT s.*, row_number() OVER (PARTITION BY s.block_key
         |    ORDER BY s.base_name) AS rnk
         |  FROM stats s JOIN sizes z USING (block_key)
         |  WHERE z.bn > $GovRecallCap AND z.bn <= $GovAuditBlockMax
         |), kept AS (
         |  SELECT a.base_name AS a_name, b.base_name AS b_name
         |  FROM hot a JOIN hot b
         |    ON a.block_key = b.block_key
         |   AND b.rnk BETWEEN a.rnk + 1 AND a.rnk + ${GovRecallWindow - 1}
         |  WHERE ((a.token_key = b.token_key)
         |         AND jaro_winkler_similarity(a.base_name, b.base_name) >= 0.85)
         |     OR jaro_winkler_similarity(a.base_name, b.base_name) >= 0.90
         |), allp AS (
         |  SELECT a.base_name AS a_name, b.base_name AS b_name
         |  FROM hot a JOIN hot b
         |    ON a.block_key = b.block_key AND a.base_name < b.base_name
         |  WHERE ((a.token_key = b.token_key)
         |         AND jaro_winkler_similarity(a.base_name, b.base_name) >= 0.85)
         |     OR jaro_winkler_similarity(a.base_name, b.base_name) >= 0.90
         |), dropped AS (
         |  SELECT a_name, b_name FROM allp
         |  EXCEPT SELECT a_name, b_name FROM kept
         |)
         |SELECT k.n_kept, d.n_dropped, bg.n_governed_blocks,
         |       bu.n_unaudited_blocks,
         |       CASE WHEN bu.n_unaudited_blocks > 0 THEN NULL
         |            WHEN k.n_kept + d.n_dropped = 0 THEN 1.0
         |            ELSE round(k.n_kept / (k.n_kept + d.n_dropped), 6)
         |       END AS recall_audited
         |FROM (SELECT count(*) AS n_kept FROM kept) k,
         |     (SELECT count(*) AS n_dropped FROM dropped) d,
         |     (SELECT CAST(coalesce(sum(CASE WHEN bn > $GovRecallCap THEN 1 ELSE 0 END), 0) AS BIGINT)
         |        AS n_governed_blocks FROM sizes) bg,
         |     (SELECT CAST(coalesce(sum(CASE WHEN bn > $GovAuditBlockMax THEN 1 ELSE 0 END), 0) AS BIGINT)
         |        AS n_unaudited_blocks FROM sizes) bu""".stripMargin,

    "dedup_clusters" ->
      s"""$partPipeline
         |SELECT row_order, cluster_id FROM final ORDER BY row_order""".stripMargin,

    "dedup_clusters_supplier" ->
      s"""${Sql.dedupPipelineCte("supplier", "s_suppkey", "s_name")}
         |SELECT row_order, cluster_id, cluster_size, confidence
         |FROM final ORDER BY row_order""".stripMargin,

    // same pipeline CTE over the sampled-subquery source; the sample
    // predicate rides inside the FROM so every stage (blocking, pair
    // join, recursive closure, election) sees only sampled rows —
    // restriction-then-pipeline, matching the Spark plan's order
    "dedup_clusters_supplier_sample" ->
      s"""${Sql.dedupPipelineCte(
              "(SELECT * FROM supplier WHERE substr(md5(s_name), 1, 1) = '0') AS supplier_sample",
              "s_suppkey", "s_name")}
         |SELECT row_order, cluster_id, cluster_size, confidence
         |FROM final ORDER BY row_order""".stripMargin,

    "dedup_full_strict" -> {
      val strict = DedupSettings(hardThreshold = 0.95, softThreshold = 0.92,
        noSubsidiaryFold = true, addMap = Map("SPRING BOLT" -> "BOLT OF SPRING"))
      s"""${Sql.dedupPipelineCte("part", "p_partkey", "p_name", strict)}
         |SELECT row_order, original_name, normalized_name, base_name, cluster_id,
         |       cluster_size, canonical_name, confidence, reason
         |FROM final ORDER BY row_order""".stripMargin
    },

    "dedup_full" ->
      s"""$partPipeline
         |SELECT row_order, original_name, normalized_name, base_name, cluster_id,
         |       cluster_size, canonical_name, confidence, reason
         |FROM final ORDER BY row_order""".stripMargin,

    "dedup_mapping" ->
      s"""$partPipeline
         |SELECT original_name, canonical_name FROM final
         |ORDER BY original_name, canonical_name""".stripMargin,

    "dedup_summary" ->
      s"""$partPipeline
         |SELECT cluster_id, canonical_name, count(*) AS count FROM final
         |GROUP BY 1, 2 ORDER BY cluster_id, canonical_name""".stripMargin,

    "dedup_review" ->
      s"""$partPipeline
         |SELECT row_order, original_name, normalized_name, base_name, cluster_id,
         |       cluster_size, canonical_name, confidence, reason
         |FROM final
         |WHERE confidence >= 0.95 AND cluster_size >= 2
         |ORDER BY row_order""".stripMargin,

    "dedup_stats" ->
      s"""$partPipeline
         |SELECT count(*) AS total_rows,
         |       count(DISTINCT cluster_id) AS total_clusters,
         |       CAST(sum(CASE WHEN cluster_size >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS multi_record_clusters,
         |       CAST(sum(CASE WHEN confidence >= 0.95 AND cluster_size >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS high_confidence_review_rows
         |FROM final""".stripMargin,

    "dedup_settings" ->
      """SELECT * FROM (VALUES
        |  ('hard_threshold', '0.9'), ('soft_threshold', '0.85'),
        |  ('suffix_list_size', '26'), ('explicit_maps', ''),
        |  ('subsidiary_folding', 'true'), ('preserved_all_rows', 'true'))
        |AS t(setting, value)""".stripMargin,

    "enrich_industry" ->
      s"""$partPipeline
         |SELECT DISTINCT canonical_name,
         |       ${Sql.industryCase("canonical_name")} AS industry
         |FROM final ORDER BY canonical_name""".stripMargin
  )
}
