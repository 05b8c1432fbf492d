package graft.oracle

import graft.dedup.Rules

/** DuckDB SQL fragment builders that mirror the Spark column
  * functions in [[graft.dedup.Normalize]] expression-for-expression.
  * Generated from the same [[Rules]] constants so the two sides cannot
  * drift. DuckDB regexes are RE2 (ASCII `\w`) — equivalent to the
  * Spark side on the ASCII driver testdata. */
object Sql {

  /** F1 — normalize. DuckDB regexp_replace needs the 'g' flag to
    * replace all occurrences (Spark replaces all by default). */
  def normalize(col: String): String =
    s"trim(regexp_replace(regexp_replace(upper(coalesce(CAST($col AS VARCHAR), '')), " +
      s"'[^\\w\\s&/-]', ' ', 'g'), '\\s+', ' ', 'g'))"

  private def stripOnce(inner: String, tokens: Seq[String]): String = {
    val alt = tokens.mkString("|")
    s"trim(regexp_replace($inner, '\\b(?:$alt)$$', ''))"
  }

  private def stripFix(inner: String, tokens: Seq[String], k: Int): String =
    (1 to k).foldLeft(inner)((acc, _) => stripOnce(acc, tokens))

  /** F2+F3 — suffix strip then country fold, same bounded fixpoints as
    * Normalize.stripSuffixes/foldSubsidiaries. */
  def stripAndFold(inner: String): String =
    stripFix(stripFix(inner, Rules.Suffixes, 6), Rules.Countries, 4)

  /** F4 — acronym rewrite as a CASE expression. */
  def acronyms(inner: String): String = {
    val whens = Rules.DefaultAcronyms.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ")
    s"(CASE $inner $whens ELSE $inner END)"
  }

  /** F5 — full base-name derivation from a normalized-name column. */
  def baseName(normCol: String): String = acronyms(stripAndFold(normCol))

  /** K1 — blocking key. `//` is DuckDB integer division, matching
    * Python's `len(base) // 5`. */
  def blockKey(base: String): String =
    s"(CASE WHEN $base = '' THEN 'NONE' ELSE substr($base, 1, 1) || '_' || " +
      s"CAST(length($base) // 5 AS VARCHAR) || '_' || split_part($base, ' ', 1) END)"

  /** Shared CTE: the derived-column contract over a (key, name) pair
    * of a source table. */
  def derivedCte(table: String, keyCol: String, nameCol: String): String =
    s"""WITH rows0 AS (
       |  SELECT CAST($keyCol AS BIGINT) AS row_order,
       |         CAST($nameCol AS VARCHAR) AS original_name,
       |         ${normalize(nameCol)} AS normalized_name
       |  FROM $table
       |), rows1 AS (
       |  SELECT *, ${baseName("normalized_name")} AS base_name FROM rows0
       |), derived AS (
       |  SELECT *, ${blockKey("base_name")} AS block_key FROM rows1
       |)""".stripMargin

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
