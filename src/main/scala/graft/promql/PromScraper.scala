package graft.promql

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.SparkSession

/** The SCRAPE-IN client — the loop a Prometheus server runs against
  * every target, pointed at any text-exposition endpoint and landing
  * each scrape as one prunable append: poll `GET url`, parse the body
  * with the shared [[graft.operators.Firehose.PromGrammar]] (the same
  * grammar the DSv2 `prom` source, the HTTP ingest endpoint, and the
  * expression-level `promParse` run), stamp lines without exposition
  * timestamps with the scrape time, and
  * [[PromQlVersioned.landExposition]] the batch. Together with
  * [[PromQlHttp]] this closes the full deployment circle engine-side:
  * scrape in (this client, or POSTed ingest, or the DSv2 file source) →
  * Versioned landing → PromQL out (`/api/v1/query*`) → text exposition
  * back out (`/federate`) → scrape-able again — each arc spec-pinned
  * round-trip-exact.
  *
  * Scale shape: each scrape is one O(batch) retry-append (concurrent
  * scrapers commute on the append-only landing); the landing grows by
  * registry-sized files carrying timestamp stats, so dashboards over it
  * prune to their windows and [[PromQlVersioned.expire]] retires whole
  * files as they age past retention — the complete TSDB lifecycle with
  * no component bigger than a scrape batch.
  */
object PromScraper {

  private lazy val client = HttpClient.newHttpClient()

  /** One scrape: GET `url`, land the parsed batch at `root`. Lines
    * without exposition timestamps take `tsSec` (defaults to the wall
    * clock — the scrape time, Prometheus's own stamping rule). A
    * non-200 response or malformed body refuses loudly; nothing lands.
    * Returns (committed version, samples landed).
    */
  def scrapeOnce(
      spark: SparkSession, url: String, root: String,
      component: String = "scrape", tsSec: Option[Long] = None): (Long, Int) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET()
        // Prometheus's own negotiation: prefer the classic text format,
        // accept OpenMetrics — and read the RESPONSE content type to
        // pick the timestamp unit (millis vs float seconds; the same
        // line is valid in both formats, so the unit is never guessed)
        // `escaping=allow-utf-8` advertises the Prometheus 3.x quoted
        // UTF-8 name form (r16: all four readers speak it) — a 3.x
        // endpoint may then expose `{"my.metric",k="v"}` lines instead
        // of underscore-mangled names; classic endpoints ignore it
        .header("Accept",
          "text/plain;version=0.0.4;escaping=allow-utf-8;q=0.9," +
            "application/openmetrics-text;version=1.0.0;" +
            "escaping=allow-utf-8;q=0.8,*/*;q=0.1")
        .build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"scrape of $url failed: HTTP ${resp.statusCode()}")
    val om = resp.headers().firstValue("Content-Type").orElse("")
      .toLowerCase(java.util.Locale.ROOT).contains("application/openmetrics-text")
    val stamp = tsSec.getOrElse(System.currentTimeMillis() / 1000L)
    PromQlVersioned.landExposition(spark, root, resp.body(), component,
      Some(stamp), s"scrape-$stamp-${java.util.UUID.randomUUID().toString.take(8)}",
      omTimestamps = om)
  }

  /** The scrape LOOP: `ticks` scrapes, `intervalMs` apart (pass
    * `Int.MaxValue` ticks for a production loop; tests pass small
    * counts). A FAILED tick (non-200, malformed body, a lost commit
    * race) logs and SKIPS — Prometheus's own target loop records a
    * failed scrape and keeps going; one transient target restart must
    * not kill a months-running loop ([[scrapeOnce]] keeps the loud
    * single-shot refusal). `compactEvery > 0` arms the AUTO-COMPACT
    * tick — every N scrapes, [[graft.sources.Versioned.compactSmall]]
    * bin-packs the accumulated registry-sized tick files
    * (≤ `compactMaxBytes` each) into one, so a loop that appends one
    * small file per tick holds its file count at
    * O(compactEvery + large files) instead of O(ticks) — together with
    * the retention tick ([[PromQlVersioned.expire]]), the landing's
    * full lifecycle automation; its failures skip the same way (the
    * next armed tick compacts again). `checkpointEvery > 0` arms the
    * REGISTRY-CHECKPOINT tick — every N scrapes,
    * [[PromRegistry.checkpoint]] lands the head map as one
    * registry-sized snapshot commit, so a RESTARTED server bootstraps
    * from checkpoint ∪ delta-files-since instead of re-scanning the
    * corpus (the registry's cold-start path); failures skip likewise.
    * `onScrape` fires after each
    * successful scrape — the progress hook a forever loop needs, since
    * it never returns. Returns the successful scrapes'
    * (version, samples) for FINITE loops; forever mode accumulates
    * nothing (a year of 15 s ticks must not grow a driver-side vector).
    */
  def run(
      spark: SparkSession, url: String, root: String,
      component: String = "scrape", intervalMs: Long = 15000L,
      ticks: Int = Int.MaxValue,
      tsSec: Int => Option[Long] = _ => None,
      compactEvery: Int = 0,
      compactMaxBytes: Long = graft.sources.Versioned.DefaultSmallFileBytes,
      checkpointEvery: Int = 0,
      onScrape: (Long, Int) => Unit = (_, _) => ()): Seq[(Long, Int)] = {
    val out = Seq.newBuilder[(Long, Int)]
    var i = 1
    while (i <= ticks) {
      try {
        val (v, n) = scrapeOnce(spark, url, root, component, tsSec(i))
        // warm the latest-gauge registry EAGERLY: the delta fold runs on
        // the scraper's clock, so the first /federate (or instant) poll
        // after this append answers from the memo instead of paying it
        try PromRegistry.refresh(spark, root)
        catch { case scala.util.control.NonFatal(_) => () }
        onScrape(v, n)
        if (ticks != Int.MaxValue) out += ((v, n))
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] scrape $i of $url failed, skipping: " +
            e.getMessage)
      }
      if (compactEvery > 0 && i % compactEvery == 0)
        try graft.sources.Versioned.compactSmall(spark, root, compactMaxBytes)
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[graft] auto-compact of $root skipped: " +
              e.getMessage)
        }
      if (checkpointEvery > 0 && i % checkpointEvery == 0)
        try PromRegistry.checkpoint(spark, root)
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft] registry checkpoint of $root skipped: " + e.getMessage)
        }
      if (i < ticks) Thread.sleep(intervalMs)
      i += 1
    }
    out.result()
  }
}
