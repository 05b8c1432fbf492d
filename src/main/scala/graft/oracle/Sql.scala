package graft.oracle

import graft.dedup.{DedupSettings, Rules}

/** DuckDB SQL fragment builders that mirror the Spark column
  * functions in [[graft.dedup.Normalize]] expression-for-expression.
  * Generated from the same [[Rules]] constants so the two sides cannot
  * drift.
  *
  * Unicode dialect notes (the RE2-vs-Java-`(?U)` surface, SURVEY.md
  * §F1): RE2's bare `\w` is ASCII while Spark matches Java's
  * `(?U)\w`, so [[normalize]]'s keep-class spells out the Unicode
  * properties `(?U)\w` implies — letters `\p{L}`, marks `\p{M}`,
  * decimal digits `\p{Nd}`, letter-numbers `\p{Nl}`, connector
  * punctuation `\p{Pc}` — making the twins agree on accented/CJK/
  * Greek/Cyrillic names (fuzzed via tools/fuzz.py --unicode-names).
  * Residual fringe divergences are PINNED IN SPECS, not papered
  * over: `\b` before an ASCII suffix differs when a Unicode letter
  * directly abuts the suffix (NormalizeSpec — space-separated
  * suffixes, the only shape the reference data has, agree), and
  * DuckDB's jaro_winkler_similarity is byte-based while ours is
  * code-point-based like the reference (JaroWinklerSpec documents
  * the dialect; the fuzzer keeps non-ASCII names in singleton blocks
  * so no cross-engine JW compare runs on them). */
object Sql {

  /** F1 — normalize. DuckDB regexp_replace needs the 'g' flag to
    * replace all occurrences (Spark replaces all by default). */
  def normalize(col: String): String =
    s"trim(regexp_replace(regexp_replace(upper(coalesce(CAST($col AS VARCHAR), '')), " +
      s"'[^\\w\\s&/\\-\\p{L}\\p{M}\\p{Nd}\\p{Nl}\\p{Pc}]', ' ', 'g'), '\\s+', ' ', 'g'))"

  private def stripOnce(inner: String, tokens: Seq[String]): String = {
    val alt = tokens.mkString("|")
    s"trim(regexp_replace($inner, '\\b(?:$alt)$$', ''))"
  }

  private def stripFix(inner: String, tokens: Seq[String], k: Int): String =
    (1 to k).foldLeft(inner)((acc, _) => stripOnce(acc, tokens))

  /** F2+F3 — suffix strip then country fold, same bounded fixpoints
    * as Normalize.stripSuffixes/foldSubsidiaries. */
  def stripAndFold(inner: String, settings: DedupSettings = DedupSettings()): String = {
    val stripped = stripFix(inner, Rules.Suffixes, Rules.SuffixFixpointBound)
    if (settings.noSubsidiaryFold) stripped
    else stripFix(stripped, Rules.Countries, Rules.CountryFixpointBound)
  }

  /** F4 — acronym rewrite as a CASE expression. */
  def acronyms(inner: String, settings: DedupSettings = DedupSettings()): String = {
    val whens = settings.acronymMap.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ")
    s"(CASE $inner $whens ELSE $inner END)"
  }

  /** F5 — full base-name derivation from a normalized-name column. */
  def baseName(normCol: String, settings: DedupSettings = DedupSettings()): String =
    acronyms(stripAndFold(normCol, settings), settings)

  /** K1 — blocking key. `//` is DuckDB integer division, matching
    * Python's `len(base) // 5`. */
  def blockKey(base: String): String =
    s"(CASE WHEN $base = '' THEN 'NONE' ELSE substr($base, 1, 1) || '_' || " +
      s"CAST(length($base) // 5 AS VARCHAR) || '_' || split_part($base, ' ', 1) END)"

  /** Shared CTE: the derived-column contract over a (key, name) pair
    * of a source table. */
  def derivedCte(table: String, keyCol: String, nameCol: String,
      settings: DedupSettings = DedupSettings()): String =
    s"""WITH rows0 AS (
       |  SELECT CAST($keyCol AS BIGINT) AS row_order,
       |         CAST($nameCol AS VARCHAR) AS original_name,
       |         ${normalize(nameCol)} AS normalized_name
       |  FROM $table
       |), rows1 AS (
       |  SELECT *, ${baseName("normalized_name", settings)} AS base_name FROM rows0
       |), derived AS (
       |  SELECT *, ${blockKey("base_name")} AS block_key FROM rows1
       |)""".stripMargin

  /** M2 — token-sorted key (engine.py:205-208). */
  def tokenKey(col: String): String =
    s"array_to_string(list_sort(string_split($col, ' ')), '')"

  /** C2 — pair confidence ladder (engine.py:371-375); cut points are
    * fixed, independent of the settings thresholds. */
  def pairConf(ratio: String, token: String): String =
    s"(CASE WHEN $token AND $ratio >= 0.90 THEN CAST(0.98 AS DOUBLE) " +
      s"WHEN $ratio >= 0.90 THEN CAST(0.95 AS DOUBLE) " +
      s"WHEN $ratio >= 0.85 THEN CAST(0.88 AS DOUBLE) " +
      s"ELSE CAST(0.70 AS DOUBLE) END)"

  /** Full dedup pipeline (E3) as a `WITH RECURSIVE` CTE chain ending
    * in `final` — mirrors graft.dedup.{Matching,Cluster,Pipeline}
    * stage for stage; the union-find is a recursive transitive
    * closure over the distinct-name graph (tractable because nodes =
    * distinct base names, not rows). */
  def dedupPipelineCte(table: String, keyCol: String, nameCol: String,
      settings: DedupSettings = DedupSettings()): String = {
    val soft = settings.softThreshold
    val hard = settings.hardThreshold
    val derived = derivedCte(table, keyCol, nameCol, settings)
      .replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$derived, stats AS (
       |  SELECT block_key, base_name, count(*) AS n_rows,
       |         min(row_order) AS min_row, max(row_order) AS max_row
       |  FROM derived WHERE base_name <> '' GROUP BY 1, 2
       |), pairs AS (
       |  SELECT a.base_name AS a_name, b.base_name AS b_name,
       |         a.min_row AS a_min_row, b.min_row AS b_min_row,
       |         a.max_row AS a_max_row, b.max_row AS b_max_row,
       |         jaro_winkler_similarity(a.base_name, b.base_name) AS ratio,
       |         (${tokenKey("a.base_name")} = ${tokenKey("b.base_name")}) AS token_match
       |  FROM stats a JOIN stats b
       |    ON a.block_key = b.block_key AND a.base_name < b.base_name
       |), qpairs AS (
       |  SELECT *, ${pairConf("ratio", "token_match")} AS pair_conf
       |  FROM pairs
       |  WHERE (token_match AND ratio >= $soft) OR ratio >= $hard
       |), edges AS (
       |  SELECT a_min_row AS s, b_min_row AS d FROM qpairs
       |  UNION SELECT b_min_row, a_min_row FROM qpairs
       |), reach AS (
       |  SELECT min_row AS s, min_row AS d FROM stats
       |  UNION
       |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
       |), comp AS (
       |  SELECT s AS min_row, min(d) AS component FROM reach GROUP BY 1
       |), namecluster AS (
       |  SELECT st.base_name, c.component AS cluster_id
       |  FROM stats st JOIN comp c ON st.min_row = c.min_row
       |), candidates AS (
       |  SELECT base_name AS cand_name, CAST(0.98 AS DOUBLE) AS cand_conf,
       |         max_row AS partner_max_row
       |  FROM stats WHERE n_rows >= 2
       |  UNION ALL SELECT a_name, pair_conf, b_max_row FROM qpairs
       |  UNION ALL SELECT b_name, pair_conf, a_max_row FROM qpairs
       |), rowconf AS (
       |  SELECT d.row_order, max(c.cand_conf) AS max_cand_conf
       |  FROM derived d LEFT JOIN candidates c
       |    ON d.base_name = c.cand_name AND c.partner_max_row > d.row_order
       |  GROUP BY 1
       |), clustered AS (
       |  SELECT d.*, coalesce(nc.cluster_id, d.row_order) AS cluster_id,
       |         (CASE WHEN d.base_name = '' THEN CAST(0.50 AS DOUBLE)
       |               ELSE coalesce(rc.max_cand_conf, CAST(0.70 AS DOUBLE)) END) AS confidence
       |  FROM derived d
       |  LEFT JOIN namecluster nc ON d.base_name = nc.base_name
       |  LEFT JOIN rowconf rc ON d.row_order = rc.row_order
       |), votes AS (
       |  SELECT cluster_id, base_name, count(*) AS votes
       |  FROM clustered WHERE base_name <> '' GROUP BY 1, 2
       |), elected AS (
       |  SELECT cluster_id, base_name AS elected_name FROM votes
       |  QUALIFY row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY votes DESC, length(base_name) ASC, base_name ASC) = 1
       |), sizes AS (
       |  SELECT cluster_id, count(*) AS cluster_size FROM clustered GROUP BY 1
       |), final AS (
       |  SELECT c.row_order, c.original_name, c.normalized_name, c.base_name,
       |         c.cluster_id, s.cluster_size,
       |         coalesce(e.elected_name, c.normalized_name) AS canonical_name,
       |         c.confidence,
       |         (CASE WHEN c.confidence = 0.50 THEN 'No base name after cleaning; kept as singleton'
       |               WHEN c.confidence = 0.98 THEN 'token-sorted match AND ratio >= 0.90'
       |               WHEN c.confidence = 0.95 THEN 'ratio >= 0.90'
       |               WHEN c.confidence = 0.88 THEN 'ratio >= 0.85'
       |               ELSE 'Isolated or weak match' END) AS reason
       |  FROM clustered c
       |  LEFT JOIN elected e ON c.cluster_id = e.cluster_id
       |  JOIN sizes s ON c.cluster_id = s.cluster_id
       |)""".stripMargin
  }

  /** W3 — pure keyword industry classification (engine.py:115-126):
    * first industry whose keyword is contained in the name wins. */
  def industryCase(nameCol: String): String = {
    val branches = Rules.IndustryKeywords.map { case (industry, keys) =>
      val cond = keys.map(k => s"contains($nameCol, '$k')").mkString(" OR ")
      s"WHEN $cond THEN '$industry'"
    }.mkString(" ")
    s"(CASE WHEN $nameCol = '' THEN 'Unknown' $branches ELSE 'Diversified/Other' END)"
  }
}
