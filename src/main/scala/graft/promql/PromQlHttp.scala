package graft.promql

import java.net.InetSocketAddress
import java.net.URLDecoder
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The compiler served over HTTP in the Prometheus wire format — the
  * deployment loop's last arc (scrape in via the DSv2 `prom` source,
  * store in a Versioned landing, query out over the `api/v1` query
  * endpoints), on the
  * same JDK-only `com.sun.net.httpserver` the scrape endpoint
  * ([[graft.streaming.Prometheus.startPullServer]]) already uses. A
  * Grafana-shaped client can point at this server:
  *
  *  - `GET|POST /api/v1/query?query=Q&time=T` — INSTANT evaluation
  *    ([[PromQl.compileInstantVector]]): Prometheus `/api/v1/query`
  *    semantics (5m lookback delta, staleness markers, left-open range
  *    windows). `time` accepts unix seconds (integer or float, floored);
  *    omitted, it defaults to the stream's newest sample timestamp (a
  *    landed batch corpus has no "now"). Non-standard knob `lookback`
  *    (seconds or PromQL duration) overrides the 5m delta — the server
  *    flag `--query.lookback-delta`, exposed per-query because each
  *    request may target a differently-scraped landing.
  *  - `GET|POST /api/v1/query_range?query=Q&start=S&end=E&step=W` —
  *    PROMETHEUS-EXACT point-grid evaluation by default
  *    ([[PromQl.compileRangeVector]]: every point `start + i·step ≤ end`
  *    evaluates independently under the instant rules — the wire
  *    contract a Grafana client expects), with the engine's own windowed
  *    step-grid model ([[PromQl.compileSlidingVector]] filtered to the
  *    span) behind `mode=grid` for consumers of the landed-window
  *    semantics every batch operator shares. `step` accepts seconds or
  *    a PromQL duration (`15s`, `1m`, `2h`); `lookback` applies per
  *    point like the instant endpoint's.
  *
  * The METADATA endpoints Grafana's autocomplete asks for are served
  * too: `/api/v1/labels` (label names), `/api/v1/label/<n>/values`,
  * and `/api/v1/series` — each over the optional `start`/`end` span
  * (file-pruned on a landing server) filtered to the union of
  * repeatable `match[]` series selectors through the compiler's own
  * matcher predicate; the engine's `component` dimension and
  * `__name__` surface as labels. Results are registry-sized.
  *
  * Responses are Prometheus-exact JSON envelopes:
  * `{"status":"success","data":{"resultType":"vector"|"matrix",
  * "result":[{"metric":{…},"value":[t,"v"]|"values":[[t,"v"],…]}]}}`;
  * compile/parse errors return 400 with
  * `{"status":"error","errorType":"bad_data","error":…}` (Prometheus's
  * envelope for malformed expressions). The `metric` object carries the
  * label set plus `__name__` (when the expression kept a name) and the
  * engine's `component` stream dimension as a plain label.
  *
  * Scale shape: the heavy lifting (selector pushdown, window
  * aggregation) runs in the compiled Spark plan; only the RESULT rows —
  * a dashboard response, series × points, the same driver-bounded
  * posture as the scrape registries — are collected and rendered. The
  * relation is a thunk, re-resolved per request, so a server over
  * `Versioned.latest` always answers from the newest committed version.
  */
object PromQlHttp {

  /** Start the query API server on `port` (0 = pick a free one); returns
    * the bound server (stop with `.stop(0)`). `metrics` is resolved per
    * request — pass `() => Versioned.latest(spark, root)` to serve a
    * landing's newest committed version, or a constant relation for a
    * fixed corpus.
    */
  def startQueryServer(metrics: () => DataFrame, port: Int = 0): HttpServer =
    serve(
      (q, t, lookback, xp) =>
        PromQl.compileInstantVector(q, metrics(), t, lookbackSec = lookback,
          extrapolate = xp),
      (q, start, end, step, lookback, grid, xp) =>
        if (grid)
          PromQl.compileSlidingVector(q, metrics(), step)
            .filter(col("win_start") >= lit(start) && col("win_start") <= lit(end))
        else PromQl.compileRangeVector(q, metrics(), start, end, step, lookback,
          extrapolate = xp),
      (startOpt, endOpt) => timeFiltered(metrics(), startOpt, endOpt),
      () => newestTs(metrics()),
      port)

  private def timeFiltered(
      m: DataFrame, startOpt: Option[Long], endOpt: Option[Long]): DataFrame = {
    val lo = startOpt.fold(lit(true))(s => col("timestamp") >= lit(s))
    val hi = endOpt.fold(lit(true))(e => col("timestamp") <= lit(e))
    m.filter(lo && hi)
  }

  /** The server over a [[graft.sources.Versioned]] LANDING with
    * time-range FILE PRUNING on both endpoints ([[PromQlVersioned]]):
    * each request's scan is cut to the query's own visibility — an
    * instant query reads its lookback's files, a dashboard's
    * `query_range` reads the requested span (for the prunable shapes;
    * universe-/pin-/series-lag-dependent queries read fully, detected
    * from the AST). This is the 100 TB deployment shape: the server
    * stays up for months while the landing grows, and each request's
    * cost tracks ITS window, not the corpus.
    */
  def startLandingServer(
      spark: org.apache.spark.sql.SparkSession, root: String,
      port: Int = 0): HttpServer =
    serve(
      (q, t, lookback, xp) =>
        PromQlVersioned.compileInstantVector(spark, root, q, t,
          lookbackSec = lookback, extrapolate = xp),
      (q, start, end, step, lookback, grid, xp) =>
        if (grid)
          PromQlVersioned.compileGridRangeVector(spark, root, q, start, end, step)
        else PromQlVersioned.compileRangeVector(
          spark, root, q, start, end, step, lookbackSec = lookback,
          extrapolate = xp),
      (startOpt, endOpt) => (startOpt, endOpt) match {
        // a bounded metadata span prunes files exactly like a query —
        // the dominant Grafana pattern (label autocomplete scoped to
        // the dashboard's time range)
        case (Some(s), Some(e)) => graft.sources.Versioned.prunedRead(
          spark, root, graft.sources.Versioned.latestVersion(root),
          Seq(("timestamp", s.toDouble, e.toDouble)))
        case _ => timeFiltered(
          graft.sources.Versioned.latest(spark, root), startOpt, endOpt)
      },
      () => newestTs(graft.sources.Versioned.latest(spark, root)),
      port)

  private def serve(
      instantFn: (String, Long, Long, Boolean) => DataFrame,
      rangeFn: (String, Long, Long, Long, Long, Boolean, Boolean) => DataFrame,
      spanFn: (Option[Long], Option[Long]) => DataFrame,
      defaultTime: () => Long,
      port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // handlers run Spark ACTIONS (unlike the scrape endpoint's in-memory
    // renders) — without an executor every request serializes on the one
    // dispatch thread and a slow query_range blocks a whole dashboard's
    // panel fan-out. Spark drivers accept concurrent jobs; daemon threads
    // so an un-stopped server never pins the JVM (review catch)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
      8,
      (r: Runnable) => {
        val t = new Thread(r, "graft-query-api")
        t.setDaemon(true)
        t
      }))
    server.createContext("/api/v1/query", (ex: HttpExchange) =>
      respond(ex) { params =>
        val q = required(params, "query")
        val t = params.get("time").map(parseTime).getOrElse(defaultTime())
        val lookback = params.get("lookback").map(parseDuration).getOrElse(300L)
        val rows = instantFn(q, t, lookback, parseExtrapolate(params))
          .select(col("component"), col("name"), col("labels"),
            col("win_start"), col("value"))
          .collect()
        val entries = rows.toSeq.map { r =>
          jsonObj(Seq(
            "metric" -> metricJson(r.getString(0), r.getString(1),
              r.getMap[String, String](2).toMap),
            "value" -> sample(r.getLong(3), r.getDouble(4))))
        }.sorted // deterministic body (Prometheus guarantees no order)
        jsonObj(Seq(
          "status" -> "\"success\"",
          "data" -> jsonObj(Seq(
            "resultType" -> "\"vector\"",
            "result" -> entries.mkString("[", ",", "]")))))
      })
    server.createContext("/api/v1/query_range", (ex: HttpExchange) =>
      respond(ex) { params =>
        val q = required(params, "query")
        val start = parseTime(required(params, "start"))
        val end = parseTime(required(params, "end"))
        val step = parseDuration(required(params, "step"))
        if (end < start) throw new IllegalArgumentException(
          s"end ($end) is before start ($start)")
        if (step <= 0) throw new IllegalArgumentException("step must be positive")
        val lookback = params.get("lookback").map(parseDuration).getOrElse(300L)
        // default = Prometheus point semantics (every point an instant
        // evaluation); mode=grid selects the engine's windowed step-grid
        // model instead
        val grid = params.get("mode") match {
          case None | Some("prometheus") => false
          case Some("grid") => true
          case Some(other) => throw new IllegalArgumentException(
            s"unknown mode '$other' (expected 'prometheus' or 'grid')")
        }
        val rows = rangeFn(q, start, end, step, lookback, grid,
          parseExtrapolate(params))
          .select(col("component"), col("name"), col("labels"),
            col("win_start"), col("value"))
          .collect()
        // matrix: one entry per series identity, values in time order
        val entries = rows.toSeq
          .groupBy(r => (r.getString(0), r.getString(1),
            r.getMap[String, String](2).toSeq.sortBy(_._1)))
          .toSeq.sortBy(_._1.toString)
          .map { case ((component, name, labels), g) =>
            jsonObj(Seq(
              "metric" -> metricJson(component, name, labels.toMap),
              "values" -> g.sortBy(_.getLong(3))
                .map(r => sample(r.getLong(3), r.getDouble(4)))
                .mkString("[", ",", "]")))
          }
        jsonObj(Seq(
          "status" -> "\"success\"",
          "data" -> jsonObj(Seq(
            "resultType" -> "\"matrix\"",
            "result" -> entries.mkString("[", ",", "]")))))
      })
    // metadata endpoints — what Grafana's autocomplete asks for. All
    // three answer over the (optionally time-bounded, match[]-filtered)
    // span; results are registry-sized (distinct labels/values/series),
    // never corpus-sized.
    server.createContext("/api/v1/labels", (ex: HttpExchange) =>
      respond(ex) { params =>
        val m = matched(spanFn(params.get("start").map(parseTime),
          params.get("end").map(parseTime)), params.matches)
        val names = m.select(explode(map_keys(col("labels"))).as("l"))
          .distinct().collect().map(_.getString(0)).toSet ++
          Set("__name__", "component")
        strListJson(names.toSeq.sorted)
      })
    // /api/v1/label/<name>/values — the label name rides the path
    server.createContext("/api/v1/label", (ex: HttpExchange) =>
      respond(ex) { params =>
        val parts = ex.getRequestURI.getPath.split('/').toSeq.filter(_.nonEmpty)
        // ("api", "v1", "label", <name>, "values")
        if (parts.length != 5 || parts(4) != "values")
          throw new IllegalArgumentException(
            "expected /api/v1/label/<name>/values")
        val label = URLDecoder.decode(parts(3), StandardCharsets.UTF_8)
        val m = matched(spanFn(params.get("start").map(parseTime),
          params.get("end").map(parseTime)), params.matches)
        val valueCol = label match {
          case "__name__" => col("name")
          case "component" => col("component")
          case l => try_element_at(col("labels"), lit(l))
        }
        val values = m.select(valueCol.as("v")).filter(col("v").isNotNull)
          .distinct().collect().map(_.getString(0))
        strListJson(values.toSeq.sorted)
      })
    server.createContext("/api/v1/series", (ex: HttpExchange) =>
      respond(ex) { params =>
        if (params.matches.isEmpty) throw new IllegalArgumentException(
          "missing required parameter 'match[]'")
        val m = matched(spanFn(params.get("start").map(parseTime),
          params.get("end").map(parseTime)), params.matches)
        // distinct SERIES — deduped on the rendered series key (a map
        // column cannot join Spark's set operations directly)
        val entries = m
          .withColumn("_sk", graft.operators.Firehose.seriesKey(col("labels")))
          .dropDuplicates("component", "name", "_sk")
          .select(col("component"), col("name"), col("labels"))
          .collect().toSeq
          .map(r => metricJson(r.getString(0), r.getString(1),
            r.getMap[String, String](2).toMap))
          .sorted
        jsonObj(Seq(
          "status" -> "\"success\"",
          "data" -> entries.mkString("[", ",", "]")))
      })
    server.start()
    server
  }

  /** The span filtered to the UNION of the `match[]` selectors (each a
    * plain instant selector — Prometheus's series-selector grammar),
    * through the compiler's own matcher predicate. No selectors = the
    * whole span.
    */
  private def matched(span: DataFrame, matches: Seq[String]): DataFrame =
    if (matches.isEmpty) span
    else {
      val preds = matches.map { m =>
        PromQlParser.parse(m) match {
          case VectorSelector(name, matchers, 0L, None) =>
            (name.map(n => LabelMatcher("__name__", MatchOp.Eq, n)).toSeq ++
              matchers)
              .map(PromQlCompiler.matcherPred)
              .reduceOption(_ && _).getOrElse(lit(true))
          case _ => throw new IllegalArgumentException(
            s"match[] must be a plain series selector, got: $m")
        }
      }
      span.filter(preds.reduce(_ || _))
    }

  private def strListJson(xs: Seq[String]): String =
    jsonObj(Seq(
      "status" -> "\"success\"",
      "data" -> xs.map(s => s""""${esc(s)}"""").mkString("[", ",", "]")))

  // ───────────────────────── request plumbing ─────────────────────────

  /** Parsed request params: last-one-wins singles plus the MULTI-valued
    * `match[]` list (the one param Prometheus reads as repeatable).
    */
  private final case class Params(kv: Map[String, String], matches: Seq[String]) {
    def get(name: String): Option[String] = kv.get(name)
  }

  /** Query-string + form-body params (Prometheus accepts both GET query
    * strings and POSTed `application/x-www-form-urlencoded` bodies; a
    * param in both places reads from the body, like Go's `FormValue`).
    */
  private def paramsOf(ex: HttpExchange): Params = {
    def parse(s: String): Seq[(String, String)] =
      s.split('&').toSeq.filter(_.nonEmpty).flatMap { kv =>
        val i = kv.indexOf('=')
        if (i <= 0) None
        else Some(
          URLDecoder.decode(kv.take(i), StandardCharsets.UTF_8) ->
            URLDecoder.decode(kv.drop(i + 1), StandardCharsets.UTF_8))
      }
    val pairs =
      Option(ex.getRequestURI.getRawQuery).fold(Seq.empty[(String, String)])(parse) ++
        (if (ex.getRequestMethod == "POST")
          parse(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        else Nil)
    Params(pairs.toMap, pairs.collect { case ("match[]", v) => v })
  }

  private def required(params: Params, name: String): String =
    params.get(name).getOrElse(
      throw new IllegalArgumentException(s"missing required parameter '$name'"))

  /** The landed stream's newest sample timestamp — the instant
    * endpoint's default evaluation time (one tiny aggregate action; a
    * batch landing has no wall-clock "now").
    */
  private def newestTs(m: DataFrame): Long = {
    val r = m.agg(max(col("timestamp").cast("long"))).head()
    if (r.isNullAt(0)) throw new IllegalArgumentException(
      "the metric relation is empty — pass an explicit 'time'")
    r.getLong(0)
  }

  /** Non-standard knob: `extrapolate=true` turns on Prometheus's
    * rate/increase boundary extrapolation (Go-exact); the default keeps
    * the engine's exact-decimal interior delta sums.
    */
  private def parseExtrapolate(params: Params): Boolean =
    params.get("extrapolate") match {
      case None | Some("false") => false
      case Some("true") => true
      case Some(other) => throw new IllegalArgumentException(
        s"cannot parse '$other' as extrapolate (true|false)")
    }

  /** Unix seconds, integer or float (Prometheus floors sub-second). */
  private def parseTime(s: String): Long =
    try math.floor(s.toDouble).toLong
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"cannot parse '$s' as a unix time")
    }

  /** Seconds as a bare number, or a PromQL duration (`15s`, `5m`, `2h`). */
  private def parseDuration(s: String): Long =
    s.toLongOption.getOrElse(PromQlDurations.parse(s).fold(
      msg => throw new IllegalArgumentException(
        s"cannot parse '$s' as a duration: $msg"),
      identity))

  private def respond(ex: HttpExchange)(body: Params => String): Unit = {
    val (code, json) =
      try (200, body(paramsOf(ex)))
      catch {
        case e @ (_: PromQlParseException | _: PromQlCompileException |
            _: IllegalArgumentException) =>
          (400, errorJson("bad_data", e.getMessage))
        case e: Exception =>
          (500, errorJson("internal", s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  // ───────────────────────── JSON rendering ─────────────────────────

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 2)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  private def jsonObj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")

  private def errorJson(errorType: String, msg: String): String =
    jsonObj(Seq(
      "status" -> "\"error\"",
      "errorType" -> s""""${esc(errorType)}"""",
      "error" -> s""""${esc(if (msg == null) "" else msg)}""""))

  /** Prometheus renders sample values as strings (`[t,"v"]`), timestamps
    * as bare numbers.
    */
  private def sample(t: Long, v: Double): String = {
    val s =
      if (v.isNaN) "NaN"
      else if (v.isPosInfinity) "+Inf"
      else if (v.isNegInfinity) "-Inf"
      else if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
      else v.toString
    s"""[$t,"$s"]"""
  }

  private def metricJson(
      component: String, name: String, labels: Map[String, String]): String = {
    val named =
      (if (name == null || name.isEmpty) Map.empty[String, String]
       else Map("__name__" -> name)) ++
        (if (component == null || component.isEmpty) Map.empty[String, String]
         else Map("component" -> component)) ++
        Option(labels).getOrElse(Map.empty)
    jsonObj(named.toSeq.sortBy(_._1).map { case (k, v) =>
      k -> s""""${esc(v)}""""
    })
  }
}
