package graft.enrich

import graft.dedup.Rules

/** Pluggable external-verification interface (W1/W2/W4 in SURVEY.md
  * §2.1 — engine.py:72-183). The reference calls DuckDuckGo and a
  * Gemini model from thread pools; network I/O is nondeterministic
  * and unavailable offline, so it lives permanently behind this trait
  * and NEVER inside `SparkEntry.queries`. Implementations must be
  * Serializable — they ship to executors inside a mapPartitions
  * stage ([[Enrichment]]), which subsumes the reference's
  * ThreadPoolExecutor fan-out (X2). */
trait Verifier extends Serializable {
  /** W1 — canonical-name verification; None = no better name found. */
  def verifyName(name: String): Option[String]
  /** W2 — official-domain lookup; empty = unknown. */
  def findDomain(name: String): String
  /** W3 — industry classification. */
  def classifyIndustry(name: String): String
  /** W4 — agentic research: (official name, reason). */
  def research(name: String): Option[(String, String)]
}

/** Deterministic offline defaults: identity verification, no domain,
  * the reference's pure keyword industry rules (engine.py:115-126;
  * the dead 'SaaS' keyword omitted per SURVEY.md Appendix A.4). */
object OfflineVerifier extends Verifier {
  override def verifyName(name: String): Option[String] = None
  override def findDomain(name: String): String = ""
  override def classifyIndustry(name: String): String = {
    if (name == null || name.isEmpty) "Unknown"
    else {
      val up = name.toUpperCase
      Rules.IndustryKeywords
        .collectFirst { case (industry, keys) if keys.exists(up.contains) => industry }
        .getOrElse("Diversified/Other")
    }
  }
  /** W4 offline fallback: rule-based "research" over the known
    * acronym dictionary — deterministic, and gives the trait a live
    * code path without network (the HTTP path is [[HttpVerifier]]). */
  override def research(name: String): Option[(String, String)] =
    Option(name).map(_.trim.toUpperCase).flatMap(Rules.DefaultAcronyms.get)
      .map(official => (official, s"acronym expansion of ${name.trim}"))
}
