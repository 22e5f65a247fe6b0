package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Firehose
import graft.promql.{PromQl, PromQlHttp, PromQlVersioned}
import graft.sources.Versioned

/** The query API server ([[PromQlHttp]]): HTTP answers over a LANDED
  * stream must equal the compiler called directly — instant
  * (`/api/v1/query` == `compileInstantVector`) and range
  * (`/api/v1/query_range` == the step-grid `compileSlidingVector`
  * filtered to `[start, end]`) — in the Prometheus JSON wire format,
  * with Prometheus's error envelope for malformed expressions.
  */
class PromQlHttpSpec extends SparkSuite {

  private lazy val metrics = Firehose.tagFilter(
    Firehose.metricsFromEvents(spark, sfDir))
    .select("component", "name", "labels", "timestamp", "id", "value")

  private lazy val tMax: Long =
    metrics.agg(max(col("timestamp"))).head().getLong(0)

  // the served corpus: a real Versioned landing, resolved per request
  private lazy val root: String = {
    val r = Files.createTempDirectory("pqlhttp").toFile.getAbsolutePath
    PromQlVersioned.land(metrics, r)
    r
  }

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def post(port: Int, path: String, form: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form)).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  /** The spec's own independent rendering of what one instant-vector
    * entry must look like — duplicated from first principles (sorted
    * label keys, __name__ + component folded in, integral doubles as
    * integers) so the server's rendering is PINNED, not self-compared.
    */
  private def expectedEntries(df: DataFrame, valueKey: String): Seq[String] = {
    def fmt(v: Double): String =
      if (v.isNaN) "NaN"
      else if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
      else v.toString
    df.collect().toSeq.map { r =>
      val labels =
        (if (r.getString(1).isEmpty) Map.empty[String, String]
         else Map("__name__" -> r.getString(1))) ++
          Map("component" -> r.getString(0)) ++ r.getMap[String, String](2)
      val metric = labels.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
      s"""{"metric":$metric,"$valueKey":[${r.getLong(3)},"${fmt(r.getDouble(4))}"]}"""
    }
  }

  test("instant query over HTTP == compileInstantVector, wire-exact") {
    val server = PromQlHttp.startQueryServer(
      () => Versioned.latest(spark, root))
    try {
      val port = server.getAddress.getPort
      val q = "sum by (user) (increase(view_total[2d]))"
      val (code, body) = get(port, s"/api/v1/query?query=${enc(q)}&time=$tMax")
      assert(code === 200)
      val want = expectedEntries(
        PromQl.compileInstantVector(q, Versioned.latest(spark, root), tMax)
          .select("component", "name", "labels", "win_start", "value"),
        "value").sorted
      assert(want.nonEmpty)
      assert(body ===
        s"""{"status":"success","data":{"resultType":"vector","result":[${
          want.mkString(",")}]}}""")
      // omitted time defaults to the stream's newest sample
      assert(get(port, s"/api/v1/query?query=${enc(q)}")._2 === body)
      // POST form body carries the same params
      assert(post(port, "/api/v1/query", s"query=${enc(q)}&time=$tMax")._2 === body)
    } finally server.stop(0)
  }

  test("query_range over HTTP == the point-grid compile (default), grid mode behind mode=grid") {
    val server = PromQlHttp.startQueryServer(
      () => Versioned.latest(spark, root))
    try {
      val port = server.getAddress.getPort
      val q = "sum by (user) (view_total)"
      val (start, end, step) = (tMax - 7 * 86400L, tMax, 86400L)
      val (code, body) = get(port,
        s"/api/v1/query_range?query=${enc(q)}&start=$start&end=$end&step=1d" +
          "&lookback=1d")
      assert(code === 200)
      assert(body.startsWith(
        """{"status":"success","data":{"resultType":"matrix","result":["""))
      // mode=grid selects the engine's windowed evaluation instead
      val (gc, gBody) = get(port,
        s"/api/v1/query_range?query=${enc(q)}&start=$start&end=$end&step=1d" +
          "&mode=grid")
      assert(gc === 200 && gBody != body)
      val gDirect = PromQl.compileSlidingVector(
        q, Versioned.latest(spark, root), step)
        .filter(col("win_start") >= lit(start) && col("win_start") <= lit(end))
        .select("labels", "win_start", "value").collect()
      assert(gDirect.nonEmpty)
      gDirect.foreach { r =>
        val v = r.getDouble(2)
        val fmt =
          if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
          else v.toString
        assert(gBody.contains(s"""[${r.getLong(1)},"$fmt"]"""),
          s"grid mode missing point ${r.getLong(1)}")
      }
      // every (series, point, value) the direct POINT compile yields in
      // the span appears as a values pair of its series' matrix entry
      val direct = PromQl.compileRangeVector(
        q, Versioned.latest(spark, root), start, end, step, lookbackSec = 86400L)
        .select("labels", "win_start", "value").collect()
      assert(direct.nonEmpty)
      direct.foreach { r =>
        val user = r.getMap[String, String](0)("user")
        val v = r.getDouble(2)
        val fmt =
          if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
          else v.toString
        val pair = s"""[${r.getLong(1)},"$fmt"]"""
        val entry = body.split("""\{"metric":""").find(_.contains(s""""user":"$user""""))
        assert(entry.exists(_.contains(pair)), s"user=$user missing $pair")
      }
    } finally server.stop(0)
  }

  test("the landing server (pruned reads) answers byte-identically to the plain server") {
    val plain = PromQlHttp.startQueryServer(() => Versioned.latest(spark, root))
    val landing = PromQlHttp.startLandingServer(spark, root)
    try {
      val (p1, p2) = (plain.getAddress.getPort, landing.getAddress.getPort)
      // instant (prunable: window-interior increase) and range
      // (prunable window-local shape + the unprunable lag fallback)
      val urls = Seq(
        s"/api/v1/query?query=${enc("sum by (user) (increase(view_total[2d]))")}&time=$tMax",
        s"/api/v1/query_range?query=${enc("sum by (user) (sum_over_time(view_total[1d]))")}" +
          s"&start=${tMax - 7 * 86400}&end=$tMax&step=1d",
        s"/api/v1/query_range?query=${enc("increase(view_total[1d])")}" +
          s"&start=${tMax - 2 * 86400}&end=$tMax&step=1d")
      urls.foreach { u =>
        val (ca, a) = get(p1, u); val (cb, b) = get(p2, u)
        assert(ca === 200 && cb === 200, u)
        assert(a === b, u)
        assert(a.contains("\"result\":[{"), s"empty result for $u")
      }
    } finally { plain.stop(0); landing.stop(0) }
  }

  test("metadata endpoints: labels, label values, series — match[]-filtered") {
    val server = PromQlHttp.startLandingServer(spark, root)
    try {
      val port = server.getAddress.getPort
      // label names = map keys + the __name__/component dimensions
      val (c1, labels) = get(port, "/api/v1/labels")
      assert(c1 === 200)
      assert(labels ===
        """{"status":"success","data":["__name__","component","user"]}""")
      // values of __name__ under a match[] filter
      val (c2, names) = get(port,
        s"/api/v1/label/__name__/values?match[]=${enc("""{user="7"}""")}")
      assert(c2 === 200)
      val direct = metrics.filter(expr("""try_element_at(labels, 'user') = '7'"""))
        .select("name").distinct().collect().map(_.getString(0)).sorted
      assert(names ===
        s"""{"status":"success","data":[${direct.map("\"" + _ + "\"").mkString(",")}]}""")
      // series for a selector, time-bounded to a half-day span
      val t0 = tMax - 43200
      val (c3, series) = get(port,
        s"/api/v1/series?match[]=${enc("view_total")}&start=$t0&end=$tMax")
      assert(c3 === 200)
      val want = metrics.filter(col("name") === "view_total" &&
        col("timestamp") >= t0 && col("timestamp") <= tMax)
        .select(expr("try_element_at(labels, 'user')").as("u"))
        .distinct().collect().map(_.getString(0)).sorted
        .map(u =>
          s"""{"__name__":"view_total","component":"app","user":"$u"}""")
      assert(series ===
        s"""{"status":"success","data":[${want.mkString(",")}]}""")
      // series without match[] is a bad_data error, like Prometheus
      assert(get(port, "/api/v1/series")._1 === 400)
      // a non-selector match[] is refused
      assert(get(port,
        s"/api/v1/labels?match[]=${enc("sum(view_total)")}")._1 === 400)
    } finally server.stop(0)
  }

  test("malformed expressions get Prometheus's bad_data envelope") {
    val server = PromQlHttp.startQueryServer(
      () => Versioned.latest(spark, root))
    try {
      val port = server.getAddress.getPort
      val (code, body) = get(port, s"/api/v1/query?query=${enc("sum by (")}")
      assert(code === 400)
      assert(body.startsWith("""{"status":"error","errorType":"bad_data""""))
      // missing required params
      assert(get(port, "/api/v1/query")._1 === 400)
      assert(get(port, s"/api/v1/query_range?query=${enc("x")}&start=1&end=2")._1 === 400)
      // end < start
      assert(get(port,
        s"/api/v1/query_range?query=${enc("x")}&start=9&end=2&step=1")._1 === 400)
    } finally server.stop(0)
  }
}
