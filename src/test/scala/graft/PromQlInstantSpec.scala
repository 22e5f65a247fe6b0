package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Firehose
import graft.promql.PromQl

/** Instant-query evaluation pins (`PromQl.compileInstant` — Prometheus
  * `/api/v1/query` semantics): grid equivalence at aligned timestamps,
  * the 5m lookback delta, staleness markers, pins/offsets as constant
  * shifts, and the documented interior-delta divergence for `increase`.
  */
class PromQlInstantSpec extends SparkSuite {

  import spark.implicits._

  // A synthetic labeled stream whose timestamps NEVER land on grid
  // boundaries (ts % 3600 ∈ {10..3590}), so instant windows (t−R, t] and
  // tumbling windows [w, w+R) hold identical samples at aligned t = w+R.
  // Base hour W; three series of a counter plus one gauge.
  private val W = 1755000 * 3600L // an arbitrary aligned hour
  private def m(
      name: String, user: String, ts: Long, id: String, v: Double) =
    ("app", name, Map("user" -> user), ts, id, v)

  private lazy val synth: DataFrame = Seq(
    // counter c_total, user=a: strictly inside [W, W+3600)
    m("c_total", "a", W + 10, "1", 5.0),
    m("c_total", "a", W + 1200, "2", 9.0),
    m("c_total", "a", W + 3000, "3", 11.5),
    // counter c_total, user=b: one sample BEFORE the window (the
    // boundary-crossing delta case) + two inside
    m("c_total", "b", W - 600, "4", 100.0),
    m("c_total", "b", W + 900, "5", 104.0),
    m("c_total", "b", W + 2700, "6", 110.0),
    // gauge g, user=a: fresh sample near the window end
    m("g", "a", W + 3400, "7", 42.0),
    // gauge g, user=b: STALE — latest sample in lookback is NaN (the
    // staleness marker), with an older finite sample behind it
    m("g", "b", W + 3100, "8", 7.0),
    m("g", "b", W + 3500, "9", Double.NaN),
    // gauge g, user=c: too old for the default 5m lookback at t=W+3600
    m("g", "c", W + 100, "10", 3.0))
    .toDF("component", "name", "labels", "timestamp", "id", "value")

  private val t = W + 3600 // grid-aligned evaluation point

  private def rows(df: DataFrame): Set[(String, String, Long, Double)] =
    df.select("name", "series", "win_start", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
      .toSet

  test("instant *_over_time at aligned t == the tumbling window row") {
    for (fn <- Seq("sum_over_time", "min_over_time", "max_over_time",
        "count_over_time", "avg_over_time")) {
      val instant = rows(PromQl.compileInstant(s"$fn(c_total[1h])", synth, t))
      val grid = rows(PromQl.compile(s"$fn(c_total[1h])", synth)
        .filter(col("win_start") === W))
        .map { case (n, s, _, v) => (n, s, t, v) } // relabel to the eval time
      assert(instant.nonEmpty && instant === grid, fn)
    }
  }

  test("instant increase: interior deltas only — the boundary delta divergence") {
    val inc = rows(PromQl.compileInstant("increase(c_total[1h])", synth, t))
      .map { case (_, s, _, v) => s -> v }.toMap
    // user=a has no pre-window sample: interior == tumbling == 4 + 2.5
    assert(inc("user=a") === 6.5)
    // user=b: tumbling window W counts the crossing delta (104−100=4)
    // plus 6; instant counts only the interior delta 110−104=6
    assert(inc("user=b") === 6.0)
    val tumbling = rows(PromQl.compile("increase(c_total[1h])", synth)
      .filter(col("win_start") === W))
      .map { case (_, s, _, v) => s -> v }.toMap
    assert(tumbling("user=b") === 10.0)
  }

  test("instant selector: lookback, staleness marker, and win_start = t") {
    val g = PromQl.compileInstant("g", synth, t)
    val bySeries = g.select("series", "win_start", "value").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // a: fresh (W+3400 within (t−300, t])
    assert(bySeries("user=a") === ((t, 42.0)))
    // b: freshest lookback sample is the NaN staleness marker → absent
    // c: latest sample is older than the lookback → absent
    assert(!bySeries.contains("user=b") && !bySeries.contains("user=c"))
    // widening the lookback past c's age surfaces c (latest sample wins);
    // b stays absent — staleness is about the FRESHEST sample, not age
    val wide = PromQl.compileInstant("g", synth, t, lookbackSec = 4000L)
      .select("series", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(wide("user=c") === 3.0 && !wide.contains("user=b"))
  }

  test("range vectors drop staleness markers; absent is staleness-aware") {
    // sum_over_time over g[1h]: b's NaN marker drops, its finite 7.0 stays
    val s = rows(PromQl.compileInstant("sum_over_time(g[1h])", synth, t))
      .map { case (_, sr, _, v) => sr -> v }.toMap
    assert(s("user=b") === 7.0)
    // absent(g{user="b"}) at t: the marker makes the series absent → 1
    val ab = PromQl.compileInstant("""absent(g{user="b"})""", synth, t)
      .select("win_start", "value").collect()
    assert(ab.map(r => (r.getLong(0), r.getDouble(1))).toSeq === Seq((t, 1.0)))
    // absent of the present series yields no rows
    assert(PromQl.compileInstant("""absent(g{user="a"})""", synth, t).isEmpty)
  }

  test("offset and @ are constant shifts; start()/end() resolve to t") {
    // x offset 1h at t == x at t − 3600 (value-wise; win_start differs)
    val off = rows(PromQl.compileInstant("sum_over_time(c_total[1h] offset 1h)",
      synth, t + 3600)).map { case (n, s, _, v) => (n, s, v) }
    val base = rows(PromQl.compileInstant("sum_over_time(c_total[1h])", synth, t))
      .map { case (n, s, _, v) => (n, s, v) }
    assert(off === base && off.nonEmpty)
    // an @ pin evaluates at the pinned time regardless of t
    val pinned = rows(PromQl.compileInstant(
      s"sum_over_time(c_total[1h] @ $t)", synth, t + 86400))
      .map { case (n, s, _, v) => (n, s, v) }
    assert(pinned === base)
    // @ end() == @ start() == unpinned (an instant query's range is t)
    val endPin = rows(PromQl.compileInstant(
      "sum_over_time(c_total[1h] @ end())", synth, t))
      .map { case (n, s, _, v) => (n, s, v) }
    assert(endPin === base)
  }

  test("binary ops, time(), timestamp(), vector() at the instant point") {
    // vector arithmetic joins on the one evaluation window
    val ratio = rows(PromQl.compileInstant(
      "increase(c_total[1h]) / sum_over_time(c_total[1h])", synth, t))
    assert(ratio.map { case (_, s, w, v) => (s, w, v) } ===
      Set(("user=a", t, BigDecimal(6.5 / 25.5).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble),
        ("user=b", t, BigDecimal(6.0 / 214.0).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // time() is the evaluation timestamp
    val tv = PromQl.compileInstant("vector(time())", synth, t)
      .select("win_start", "value").collect()
    assert(tv.map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((t, t.toDouble)))
    // timestamp(sel): the freshest lookback sample's own time
    val ts = PromQl.compileInstant("timestamp(g)", synth, t)
      .select("series", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ts === Map("user=a" -> (W + 3400).toDouble))
  }

  test("subquery at instant: inner tumbling grid points in (t − R, t]") {
    // inner = instant selector per 1h window (the engine's subquery
    // model — staleness markers apply to DIRECT instant selectors, not
    // the inner grid eval, so the marked series is excluded here);
    // outer sums the grid points in (t − 2h, t]
    val sq = rows(PromQl.compileInstant(
      """sum_over_time(g{user="a"}[2h:1h])""", synth, t, lookbackSec = 4000L))
    val inner = PromQl.compileVector("""g{user="a"}""", synth, 3600L)
      .filter(col("win_start") > t - 7200 && col("win_start") <= t)
      .groupBy(col("name"), Firehose.seriesKey(col("labels")).as("series"))
      .agg(sum(col("value")).as("value"))
      .collect().map(r => (r.getString(0), r.getString(1), t,
        BigDecimal(r.getDouble(2)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet
    assert(sq === inner && sq.nonEmpty)
  }

  test("real stream: instant aggregation runs and anchors at t") {
    val metrics = Firehose.metricsFromEvents(spark, sfDir)
    val tReal = metrics.agg(max(col("timestamp"))).head().getLong(0)
    val df = PromQl.compileInstant(
      "sum by (user) (increase(view_total[2h]))", metrics, tReal)
    val got = df.collect()
    assert(got.nonEmpty && got.forall(_.getAs[Long]("win_start") == tReal))
  }
}
