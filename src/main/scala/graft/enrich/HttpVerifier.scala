package graft.enrich

import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.control.NonFatal

/** Pluggable GET transport. Injected into [[HttpVerifier]] so tests
  * run a deterministic fake and production plugs [[HttpTransport]];
  * implementations ship to executors inside mapPartitions, so they
  * must be Serializable. */
trait Transport extends Serializable {
  /** GET `url` and return the response body; throw on failure. */
  def get(url: String): String
}

/** JDK-11+ HttpClient transport (no extra dependencies). The client
  * is @transient lazy: built once per executor task deserialization,
  * never serialized. */
final class HttpTransport(timeoutMs: Long = 5000) extends Transport {
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()
  override def get(url: String): String = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $url")
    resp.body()
  }
}

/** Config for [[HttpVerifier]]. The endpoint is always injected —
  * there is no default service URL, and nothing in SparkEntry.queries
  * constructs one (the declared suite stays fully offline). */
final case class HttpVerifierConfig(
    endpoint: String,
    maxRetries: Int = 3,
    initialBackoffMs: Long = 200,
    /** Minimum ms between calls PER VERIFIER INSTANCE (≈ per task) —
      * cluster-wide QPS is tasks × 1000/minIntervalMs, so size the
      * enrichment stage's parallelism with this in mind. */
    minIntervalMs: Long = 100)

/** Production Verifier (W1/W2/W4 network behavior, engine.py:72-183
  * re-expressed for Spark): one small HTTP GET per distinct name from
  * inside the Enrichment mapPartitions stage — Spark-task parallelism
  * replaces the reference's 5-thread pool.
  *
  * Protocol (kept deliberately trivial and dependency-free):
  * `GET {endpoint}/{verify|domain|industry|research}?name=<urlencoded>`
  * returns the answer as plain text; empty body = abstain; `research`
  * returns `official|reason`.
  *
  * Resilience: exponential-backoff retry, then DEGRADE to the
  * deterministic [[OfflineVerifier]] rules — a flaky service can slow
  * enrichment down but never fail the Spark stage or change results
  * nondeterministically downstream (clustering never depends on
  * enrichment, SURVEY.md Appendix A.6).
  *
  * `sleep` is injectable for tests. */
final class HttpVerifier(
    cfg: HttpVerifierConfig,
    transport: Transport,
    sleep: Long => Unit = Thread.sleep) extends Verifier {

  // per-instance throttle clock; resets on task deserialization
  @transient private var lastCallNs = 0L

  /** Sleeping inside the lock intentionally serializes concurrent
    * callers of one instance — that IS the rate limit. */
  private def rateLimit(): Unit = synchronized {
    val sinceMs = (System.nanoTime() - lastCallNs) / 1000000L
    val waitMs = cfg.minIntervalMs - sinceMs
    if (lastCallNs != 0L && waitMs > 0) sleep(waitMs)
    lastCallNs = System.nanoTime()
  }

  /** GET with retry/backoff; None once retries are exhausted. */
  private def call(op: String, name: String): Option[String] = {
    val url = s"${cfg.endpoint}/$op?name=${URLEncoder.encode(name, UTF_8)}"
    var attempt = 0
    while (attempt <= cfg.maxRetries) {
      rateLimit()
      try return Some(transport.get(url))
      catch {
        case NonFatal(_) =>
          if (attempt < cfg.maxRetries) sleep(cfg.initialBackoffMs << attempt)
          attempt += 1
      }
    }
    None
  }

  private def answer(op: String, name: String): Option[String] =
    if (name == null || name.isEmpty) None
    else call(op, name).map(_.trim).filter(_.nonEmpty)

  override def verifyName(name: String): Option[String] =
    answer("verify", name)

  override def findDomain(name: String): String =
    answer("domain", name).getOrElse(OfflineVerifier.findDomain(name))

  override def classifyIndustry(name: String): String =
    answer("industry", name).getOrElse(OfflineVerifier.classifyIndustry(name))

  override def research(name: String): Option[(String, String)] =
    answer("research", name).map { body =>
      body.split("\\|", 2) match {
        case Array(official, reason) => (official.trim, reason.trim)
        case _ => (body.trim, "service")
      }
    }.orElse(OfflineVerifier.research(name))
}
