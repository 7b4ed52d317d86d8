package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.util.matching.Regex

/** S7 transport — the real HTTP implementation of [[Fetch.fetchNew]]'s
  * injected `(list, fetch)` pair, built on the JDK's `java.net.http`
  * client (no external dependency). Reference behavior
  * (`transform_conte_ts_data.py`):
  *
  *  - `list()` GETs the base URL and scrapes the index page's anchor
  *    hrefs (`:872-892` — the BeautifulSoup walk over an Apache-style
  *    directory listing), keeping entries that fully match
  *    `entryPattern`.
  *  - `fetch(name)` GETs `base/name` with the configured headers and
  *    per-request timeout (`:654-659`), demands HTTP 200
  *    (`raise_for_status`, `:656`) and a non-empty body (the
  *    `getsize > 0` success check, `:665`).
  *
  * Retry/backoff, idempotency, ordering, and atomic staging all stay
  * in [[Fetch.fetchNew]] / [[Orchestration]] — a failed `fetch` here
  * throws and the caller's `retryWithBackoff` owns the schedule, so
  * the transport itself holds no retry state (the reference's
  * per-thread retry loop, `:661-671`, collapsed into the one shared
  * mechanism).
  */
final class HttpTransport(
    baseUrl: String,
    headers: Map[String, String] = Map.empty,
    requestTimeout: Duration = Duration.ofSeconds(300),
    entryPattern: Regex = HttpTransport.AnyEntry,
    connectTimeout: Duration = Duration.ofSeconds(30)) {

  private val base = if (baseUrl.endsWith("/")) baseUrl else baseUrl + "/"

  private val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(connectTimeout)
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def get[T](url: String,
                     handler: HttpResponse.BodyHandler[T]): T = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(requestTimeout).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), handler)
    require(resp.statusCode() == 200,
      s"GET $url returned HTTP ${resp.statusCode()}")
    resp.body()
  }

  /** Anchor hrefs of the index page that fully match `entryPattern`,
    * de-duplicated in page order. Hrefs containing '?', '#', or ':'
    * are dropped unconditionally — query strings (Apache's "?C=N;O=D"
    * column-sort links), fragments, and absolute/scheme URLs can never
    * be plain directory entries, and under the permissive default
    * pattern they would otherwise be staged as junk files.
    * [[Fetch.fetchNew]] re-orders the survivors deterministically and
    * rejects non-plain-file names.
    */
  def list(): Seq[String] = {
    val html = get(base, HttpResponse.BodyHandlers.ofString())
    HttpTransport.Href.findAllMatchIn(html).map(_.group(1))
      .filterNot(h => h.exists(c => c == '?' || c == '#' || c == ':'))
      .filter(h => entryPattern.pattern.matcher(h).matches())
      .toSeq.distinct
  }

  /** The entry's bytes; throws on non-200 or an empty body so the
    * caller's bounded retry treats both as transient failures.
    */
  def fetch(name: String): Array[Byte] = {
    val bytes = get(base + name, HttpResponse.BodyHandlers.ofByteArray())
    require(bytes.nonEmpty, s"GET $base$name returned an empty body")
    bytes
  }
}

object HttpTransport {
  /** href attribute of an anchor tag — the only structure an
    * Apache/nginx index page guarantees.
    */
  private[pipeline] val Href: Regex =
    """(?i)<a\s[^>]*href\s*=\s*"([^"]+)"""".r

  val AnyEntry: Regex = ".*".r
}
