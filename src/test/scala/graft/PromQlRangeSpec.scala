package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Firehose
import graft.promql.{PromQl, PromQlCompileException}

/** Point-grid range evaluation (`PromQl.compileRange` — Prometheus
  * `/api/v1/query_range` semantics): the DEFINING equivalence is that
  * the range evaluation at points {start + i·step} equals the instant
  * evaluation run independently at every point — `compileInstant` is
  * the per-point oracle, itself pinned against the fuzz interpreter and
  * DuckDB. Pinned by named cases over every construct family, then a
  * seeded random leg.
  */
class PromQlRangeSpec extends SparkSuite {

  private lazy val m = Firehose.tagFilter(
    Firehose.metricsFromEvents(spark, sfDir))
    .select("component", "name", "labels", "timestamp", "id", "value")

  private lazy val tMax: Long =
    m.agg(max(col("timestamp"))).head().getLong(0)

  private val Step = 86400L
  private lazy val start = tMax - 3 * Step - 7 // non-aligned anchor
  private lazy val end = tMax
  private lazy val points: Seq[Long] =
    (0L to (end - start) / Step).map(i => start + i * Step)

  private def rows(df: DataFrame): Set[(String, String, Long, Double)] =
    df.select("name", "series", "win_start", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

  private def viaInstant(q: String, lb: Long = 300L): Set[(String, String, Long, Double)] =
    points.flatMap(p => rows(PromQl.compileInstant(q, m, p, lookbackSec = lb))).toSet

  private def viaRange(q: String, lb: Long = 300L): Set[(String, String, Long, Double)] =
    rows(PromQl.compileRange(q, m, start, end, Step, lookbackSec = lb))

  private def pin(q: String, lb: Long = 300L, nonEmpty: Boolean = true): Unit = {
    val got = viaRange(q, lb)
    assert(got === viaInstant(q, lb), q)
    if (nonEmpty) assert(got.nonEmpty, s"$q returned nothing — vacuous pin")
  }

  test("instant selectors, staleness and lookback, per point == per instant") {
    pin("view_total", lb = 86400L)
    pin("""view_total{user=~"1.*"}""", lb = 86400L)
    pin("view_total offset 12h", lb = 86400L)
  }

  test("range functions evaluate the left-open interior per point") {
    pin("sum by (user) (increase(view_total[2d]))")
    pin("rate(view_total[1d])")
    pin("avg_over_time(view_total[1d])")
    pin("max_over_time(view_total[2d])")
    pin("quantile_over_time(0.9, view_total[2d])")
    pin("irate(view_total[2d])")
    pin("resets(click_total[2d])")
    pin("deriv(view_total[2d])")
  }

  test("absent and timestamp per point") {
    pin("absent(nosuch_total)")
    pin("absent(view_total)", nonEmpty = false) // dense stream: usually present
    pin("absent_over_time(view_total[1h])", nonEmpty = false)
    pin("timestamp(view_total)", lb = 86400L)
  }

  test("aggregations, binaries, histogram and calendar compose per point") {
    pin("topk(3, sum by (user) (increase(view_total[2d])))")
    pin("increase(view_total[2d]) + increase(click_total[2d]) or increase(view_total[2d])")
    pin("histogram_quantile(0.9, view_total[2d])")
    pin("hour(timestamp(view_total))", lb = 86400L)
    pin("sum(increase(view_total[2d])) > bool 0")
  }

  test("subqueries: inner tumbling grid, point selection — any R/step") {
    // a 7h inner step does NOT tile 1d — legal under instant/point
    // semantics (the selection is an explode, not a tiling; the
    // engine's tumbling/sliding grids still refuse it)
    pin("max_over_time(sum_over_time(view_total[6h])[1d:7h])", nonEmpty = false)
    pin("sum_over_time(increase(view_total[12h])[2d:6h])")
    // the lag family OVER a subquery must be window-interior too (the
    // review-caught divergence: instant counted a crossing delta from
    // an out-of-window inner grid point)
    pin("increase(sum_over_time(view_total[1d])[2d:1d])", nonEmpty = false)
    pin("rate(view_total[2d:12h])", nonEmpty = false)
    intercept[PromQlCompileException](
      PromQl.compile("max_over_time(sum_over_time(x[1h])[1d:7h])", m).collect())
  }

  test("pins are point-constant: nested instant + literal spread") {
    val p0 = tMax - 2 * Step
    val q = s"sum_over_time(view_total[1d] @ $p0)"
    val got = viaRange(q)
    // every point carries the SAME pinned value set
    val atPin = rows(PromQl.compileInstant(q, m, start)) // instant: pin literal
      .map { case (n, s, _, v) => (n, s, v) }
    assert(atPin.nonEmpty)
    points.foreach { p =>
      assert(got.filter(_._3 == p).map { case (n, s, _, v) => (n, s, v) } === atPin,
        s"point $p")
    }
    // pinned + unpinned compose (the pinned side spread, the other side
    // per point)
    pin(s"increase(view_total[1d]) + sum_over_time(view_total[1d] @ $p0)",
      nonEmpty = false)
    // start()/end() resolve to the RANGE bounds
    val se = viaRange("sum_over_time(view_total[1d] @ end())")
    val atEnd = rows(PromQl.compileInstant("sum_over_time(view_total[1d])", m, end))
      .map { case (n, s, _, v) => (n, s, v) }
    points.foreach { p =>
      assert(se.filter(_._3 == p).map { case (n, s, _, v) => (n, s, v) } === atEnd,
        s"end() at $p")
    }
  }

  test("time() and vector() take the per-point cell") {
    // day-long lookback so the sparse stream answers at every point
    val tv = viaRange("time() - 0 * sum(view_total)", lb = 86400L)
    assert(tv.map(_._3) === points.toSet)
    tv.foreach { case (_, _, p, v) => assert(v === p.toDouble) }
    pin("vector(1)", nonEmpty = true)
  }

  test("rules on the point cadence: chain, same-cycle visibility, for-duration") {
    import graft.promql.PromQlRules
    // a record-rule chain evaluated per point equals the direct
    // composition — the recorded samples land AT their points and the
    // next rule's instant selector sees them same-cycle (the left-open
    // lookback window includes its own point)
    val outs = PromQlRules.evaluateRange(
      """r:inc = sum by (user) (increase(view_total[2d]))
        |r:total = sum(r:inc)""".stripMargin,
      m, start, end, Step)
    val direct = rows(PromQl.compileRange(
      "sum(sum by (user) (increase(view_total[2d])))", m, start, end, Step))
      .map { case (_, s, w, v) => (s, w, v) }
    val chained = rows(outs("r:total")).map { case (_, s, w, v) => (s, w, v) }
    assert(chained.nonEmpty && chained === direct)
    assert(rows(outs("r:inc")).map(_._1) === Set("r:inc"))
    // alert for-duration: k = for/step + 1 consecutive breaching POINTS
    import spark.implicits._
    val planted = Seq(
      // u1 breaches at three consecutive daily points (values persist
      // through the day-long lookback); u2's breaches straddle a gap
      ("app", "c_total", Map("user" -> "u1"), start - 10, "a", 50.0),
      ("app", "c_total", Map("user" -> "u1"), start + Step - 10, "b", 60.0),
      ("app", "c_total", Map("user" -> "u1"), start + 2 * Step - 10, "c", 70.0),
      ("app", "c_total", Map("user" -> "u2"), start - 10, "d", 55.0),
      ("app", "c_total", Map("user" -> "u2"), start + Step - 10, "e", 1.0),
      ("app", "c_total", Map("user" -> "u2"), start + 2 * Step - 10, "f", 66.0))
      .toDF("component", "name", "labels", "timestamp", "id", "value")
    val alerts = PromQlRules.evaluateRange(
      s"alert hot = c_total > 40 for ${Step}s",
      planted, start, end, Step, lookbackSec = Step)
    val fired = rows(alerts("hot")).map { case (_, s, w, _) => (s, w) }
    // u1: breaches at points 0,1,2 → fires at points 1 and 2; u2 never
    // holds two consecutive points
    assert(fired === Set(("user=u1", start + Step), ("user=u1", start + 2 * Step)))
  }

  test("extrapolation: Go's extrapolatedRate branch matrix, opt-in") {
    import spark.implicits._
    val W = 1755000 * 3600L
    val t = W + 3600
    // five series, one per Go branch: interior (no clamps), both-edges
    // threshold + zero-floor-then-threshold, counter reset, single
    // sample (emits NOTHING extrapolated), zero-floor clamp proper
    val planted = Seq(
      ("app", "x_total", Map("user" -> "a"), W + 600, "a1", 10.0),
      ("app", "x_total", Map("user" -> "a"), W + 1800, "a2", 16.0),
      ("app", "x_total", Map("user" -> "a"), W + 3000, "a3", 25.0),
      ("app", "x_total", Map("user" -> "b"), W + 1700, "b1", 5.0),
      ("app", "x_total", Map("user" -> "b"), W + 1900, "b2", 9.0),
      ("app", "x_total", Map("user" -> "c"), W + 1000, "c1", 10.0),
      ("app", "x_total", Map("user" -> "c"), W + 2000, "c2", 3.0),
      ("app", "x_total", Map("user" -> "d"), W + 500, "d1", 7.0),
      ("app", "x_total", Map("user" -> "e"), W + 300, "e1", 1.0),
      ("app", "x_total", Map("user" -> "e"), W + 3300, "e2", 100.0))
      .toDF("component", "name", "labels", "timestamp", "id", "value")
    def incAt(xp: Boolean): Map[String, Double] =
      PromQl.compileInstant("increase(x_total[1h])", planted, t, extrapolate = xp)
        .select("series", "value").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dflt = incAt(xp = false)
    assert(dflt === Map("user=a" -> 15.0, "user=b" -> 4.0, "user=c" -> 3.0,
      "user=d" -> 0.0, "user=e" -> 99.0))
    val xp = incAt(xp = true)
    // a: factor (2400+600+600)/2400 = 1.5; no clamp fires
    assert(xp("user=a") === 15.0 * 1.5)
    // b: zero-floor (200·5/4 = 250) clamps 1700 FIRST, then 250 ≥
    // threshold 220 → avg/2 = 100 both edges → factor 2 (Go's order)
    assert(xp("user=b") === 8.0)
    // c: reset keeps resultValue 3; end gap 1600 ≥ 1100 → 500
    assert(xp("user=c") === 3.0 * (1000.0 + 1000.0 + 500.0) / 1000.0)
    // d: single sample emits nothing under extrapolation (Prometheus)
    assert(!xp.contains("user=d"))
    // e: the zero-floor clamp itself (3000·1/99 < 300), same IEEE order
    val eZero = 3000.0 * (1.0 / 99.0)
    assert(xp("user=e") === 99.0 * ((3000.0 + eZero + 300.0) / 3000.0))
    // rate is the extrapolated increase / R, and the point-grid leg
    // equals per-point instant with the flag on
    val rate = PromQl.compileInstant("rate(x_total[1h])", planted, t, extrapolate = true)
      .select("series", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    xp.foreach { case (s, v) => assert(rate(s) === v / 3600.0, s) }
    val rng = rows(PromQl.compileRange(
      "increase(x_total[1h])", planted, t - 3600, t, 3600, extrapolate = true))
    val per = Seq(t - 3600, t).flatMap(p =>
      rows(PromQl.compileInstant("increase(x_total[1h])", planted, p,
        extrapolate = true))).toSet
    assert(rng === per && rng.nonEmpty)
  }

  test("fuzz: random expressions, range == per-point instant") {
    val seed = sys.env.getOrElse("GRAFT_FUZZ_SEED", "20260815").toLong
    val iters = sys.env.getOrElse("GRAFT_FUZZ_ITERS", "10").toInt
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val sels = Seq("view_total", "click_total", """{user="7"}""")
    val ranges = Seq("12h", "1d", "2d")
    val overs = Seq("sum_over_time", "min_over_time", "count_over_time")
    def modifier(): String = rnd.nextInt(3) match {
      case 0 => ""
      case 1 => s" offset ${pick(Seq("6h", "1d", "-3h"))}"
      case 2 => s" @ ${start - 86400 + rnd.nextInt(2 * 86400)}"
    }
    def leaf(): String = rnd.nextInt(5) match {
      case 0 => s"${pick(sels)}${modifier()}"
      case 1 => s"${pick(overs)}(${pick(sels)}[${pick(ranges)}]${modifier()})"
      case 2 => s"increase(${pick(sels)}[${pick(ranges)}]${modifier()})"
      case 3 => s"${pick(overs)}((${pick(sels)})[1d:7h])" // non-tiling inner step
      case 4 => s"increase((${pick(sels)})[${pick(Seq("1d", "2d"))}:6h])" // lag OVER a subquery
    }
    def expr(depth: Int): String =
      if (depth == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => leaf()
        case 1 => s"sum by (user) (${expr(depth - 1)})"
        case 2 => s"(${expr(depth - 1)}) ${pick(Seq("+", "or", "unless"))} (${expr(depth - 1)})"
      }
    // a drawn tree may RAISE at runtime in both worlds (PromQL's
    // many-to-many vector-match error — `{user="7"} + {user="7"}`
    // matches several metrics onto one key); parity covers raises too
    def attempt(f: => Set[(String, String, Long, Double)]): Either[String, Set[(String, String, Long, Double)]] =
      try Right(f)
      catch {
        case e: PromQlCompileException => Left("compile: " + e.getMessage)
        case e: Exception if Option(e.getMessage)
          .exists(_.contains("USER_RAISED_EXCEPTION")) => Left("raise")
      }
    (1 to iters).foreach { i =>
      val q = expr(1 + rnd.nextInt(2))
      val lb = pick(Seq(3600L, 86400L))
      assert(attempt(viaRange(q, lb)) === attempt(viaInstant(q, lb)), s"iter $i: $q")
    }
  }
}
