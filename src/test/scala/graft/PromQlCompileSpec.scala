package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Firehose
import graft.promql.{PromQl, PromQlCompileException}

/** Compiler pins: every compiled construct equals the hand-built operator
  * (or a first-principles expectation) on the real sf0.001 stream — the
  * no-drift contract between the string front-end and the programmatic
  * API.
  */
class PromQlCompileSpec extends SparkSuite {

  private lazy val metrics = Firehose.metricsFromEvents(spark, sfDir)

  private def rendered(df: DataFrame): Set[(String, String, Long, Double)] =
    df.select("name", "series", "win_start", "value")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet

  test("increase(x[1h]) == Firehose.counterIncrease") {
    val compiled = rendered(PromQl.compile("increase(view_total[1h])", metrics))
    val expected = Firehose.counterIncrease(
        metrics.filter(col("name") === "view_total"), 3600L)
      .select(col("name"), col("series"), col("win_start"), col("increase").as("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet
    assert(compiled.nonEmpty && compiled === expected)
  }

  test("rate is increase / range") {
    val inc = rendered(PromQl.compile("increase(click_total[1h])", metrics))
    val rate = rendered(PromQl.compile("rate(click_total[1h])", metrics))
    assert(rate === inc.map { case (n, s, w, v) =>
      (n, s, w, BigDecimal(v / 3600.0).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    })
  }

  test("*_over_time family == Firehose.overTimeAgg columns") {
    val ot = Firehose.overTimeAgg(
      metrics.filter(col("name") === "view_total"), 3600L)
    def expect(c: String): Set[(String, Long, Double)] =
      ot.select(col("series"), col("win_start"), col(c).cast("double"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .toSet
    def got(q: String): Set[(String, Long, Double)] =
      PromQl.compile(q, metrics)
        .select(col("series"), col("win_start"), col("value"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .toSet
    assert(got("avg_over_time(view_total[1h])") === expect("avg_value"))
    assert(got("sum_over_time(view_total[1h])") === expect("sum_value"))
    assert(got("min_over_time(view_total[1h])") === expect("min_value"))
    assert(got("max_over_time(view_total[1h])") === expect("max_value"))
    assert(got("last_over_time(view_total[1h])") === expect("last_value"))
    assert(got("count_over_time(view_total[1h])") === expect("n_samples"))
    assert(got("stddev_over_time(view_total[1h])") === expect("stddev_value"))
    assert(got("stdvar_over_time(view_total[1h])") === expect("stdvar_value"))
  }

  test("quantile_over_time == Firehose.quantileOverTime") {
    val got = PromQl.compile("quantile_over_time(0.9, view_total[1h])", metrics)
      .select("series", "win_start", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val exp = Firehose.quantileOverTime(
        metrics.filter(col("name") === "view_total"), 0.9, 3600L)
      .select("series", "win_start", "q_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got === exp)
  }

  test("delta/idelta/irate == Firehose.irateDelta columns") {
    val id = Firehose.irateDelta(
      metrics.filter(col("name") === "view_total"), 3600L)
    def expect(c: String): Set[(String, Long, Double)] =
      id.filter(col(c).isNotNull)
        .select("series", "win_start", c).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    def got(q: String): Set[(String, Long, Double)] =
      PromQl.compile(q, metrics)
        .select("series", "win_start", "value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got("delta(view_total[1h])") === expect("delta"))
    assert(got("idelta(view_total[1h])") === expect("idelta"))
    assert(got("irate(view_total[1h])") === expect("irate"))
  }

  test("instant selector equals last_over_time at the same step") {
    val sel = rendered(PromQl.compile("view_total", metrics, stepSec = 3600L))
    val lot = rendered(PromQl.compile("last_over_time(view_total[1h])", metrics))
    assert(sel.nonEmpty && sel === lot)
  }

  test("matchers: =~ narrows to the matching series; __name__ matcher works") {
    val all = PromQl.compile("view_total", metrics).select("series").distinct().count()
    val some = PromQl.compile("""view_total{user=~"1.*"}""", metrics)
    val users = PromQl.compileVector("""view_total{user=~"1.*"}""", metrics)
      .select(try_element_at(col("labels"), lit("user"))).distinct()
      .collect().map(_.getString(0))
    assert(users.nonEmpty && users.forall(_.startsWith("1")))
    assert(some.select("series").distinct().count() < all)
    val byName = PromQl.compile("""{__name__="view_total"}""", metrics)
    assert(rendered(byName) === rendered(PromQl.compile("view_total", metrics)))
  }

  test("offset shifts windows forward by the offset") {
    val base = rendered(PromQl.compile("increase(view_total[1h])", metrics))
    val off = rendered(PromQl.compile("increase(view_total[1h] offset 1h)", metrics))
    assert(off === base.map { case (n, s, w, v) => (n, s, w + 3600L, v) })
  }

  test("vector/vector divide with a comparison-filtered denominator") {
    val got = PromQl.compile(
      "increase(error_total[1h]) / (increase(view_total[1h]) > 0)", metrics)
      .select("series", "win_start", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // expected via the fused same-source form over one increase pass
    val inc = Firehose.counterIncrease(
      metrics.filter(col("name").isin("error_total", "view_total")), 3600L)
    val exp = Firehose.vectorMatchSameSource(
        inc, Seq("component", "series", "win_start"), "error_total", "view_total",
        (e, v) => when(v > 0, e / v), "ratio", valueCol = "increase")
      .select("series", "win_start", "ratio").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got === exp)
  }

  test("one-to-one arithmetic reduces labels to the match set and drops the name") {
    val v = PromQl.compileVector(
      "increase(error_total[1h]) / on(user) (increase(view_total[1h]) > 0)", metrics)
    assert(v.select("name").distinct().collect().map(_.getString(0)).toSeq === Seq(""))
    val keys = v.select(map_keys(col("labels"))).distinct()
      .collect().flatMap(_.getSeq[String](0)).toSet
    assert(keys === Set("user"))
  }

  test("set ops: and/unless partition the left; or has left priority") {
    val l = "increase(error_total[1h])"
    val r = "(increase(view_total[1h]) > 10)"
    val left = rendered(PromQl.compile(l, metrics))
    val and = rendered(PromQl.compile(s"$l and $r", metrics))
    val unless = rendered(PromQl.compile(s"$l unless $r", metrics))
    assert(and.nonEmpty && unless.nonEmpty)
    assert((and ++ unless) === left)
    assert(and.intersect(unless) === Set.empty)
    val or = rendered(PromQl.compile(s"$l or $r", metrics))
    val right = rendered(PromQl.compile(r, metrics))
    // every left row survives; added rows come from the right
    assert(or.intersect(left) === left)
    assert((or -- left).subsetOf(right))
  }

  test("aggregation: sum by (user) of increases matches a manual regroup") {
    val got = PromQl.compile(
      "sum by (user) (increase(view_total[1h]))", metrics)
      .select("series", "win_start", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val exp = Firehose.counterIncrease(
        metrics.filter(col("name") === "view_total"), 3600L)
      .groupBy(col("series"), col("win_start"))
      .agg(sum(col("increase").cast("decimal(26,6)")).cast("double").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got === exp)
  }

  test("topk keeps at most k rows per window with the top values") {
    val k = 3
    val got = PromQl.compile(s"topk($k, increase(view_total[1h]))", metrics)
    val counts = got.groupBy("win_start").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ <= k))
    // each kept value is at least the k-th largest in its window
    val kth = PromQl.compile("increase(view_total[1h])", metrics)
      .select("win_start", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.reverse.take(k).min).toMap
    got.select("win_start", "value").collect().foreach { r =>
      assert(r.getDouble(1) >= kth(r.getLong(0)))
    }
  }

  test("scalar arithmetic, comparison filters and bool") {
    val base = rendered(PromQl.compile("increase(view_total[1h])", metrics))
    val scaled = rendered(PromQl.compile("increase(view_total[1h]) * 2 + 1", metrics))
    assert(scaled === base.map { case (n, s, w, v) =>
      (n, s, w, BigDecimal(v * 2 + 1).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    })
    val filtered = rendered(PromQl.compile("increase(view_total[1h]) > 100", metrics))
    assert(filtered === base.filter(_._4 > 100))
    val booled = PromQl.compile("increase(view_total[1h]) > bool 100", metrics)
      .select("value").distinct().collect().map(_.getDouble(0)).toSet
    assert(booled.subsetOf(Set(0.0, 1.0)))
  }

  test("subquery: max_over_time(increase(x[1h])[6h:1h]) == manual outer rollup") {
    val got = PromQl.compile(
      "max_over_time(increase(view_total[1h])[6h:1h])", metrics)
      .select("series", "win_start", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val exp = Firehose.counterIncrease(
        metrics.filter(col("name") === "view_total"), 3600L)
      .withColumn("outer", col("win_start") - pmod(col("win_start"), lit(21600L)))
      .groupBy(col("series"), col("outer"))
      .agg(max(col("increase")).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got === exp)
  }

  test("label_replace and label_join rewrite the series identity") {
    val v = PromQl.compileVector(
      """label_replace(view_total, "tier", "$1", "user", "(\\d).*")""", metrics)
    val tiers = v.select(try_element_at(col("labels"), lit("tier")))
      .distinct().collect().map(_.getString(0)).filter(_ != null)
    assert(tiers.nonEmpty && tiers.forall(t => t.length == 1 && t.head.isDigit))
    val j = PromQl.compileVector(
      """label_join(view_total, "both", "-", "user", "user")""", metrics)
    val sample = j.select(
      try_element_at(col("labels"), lit("user")),
      try_element_at(col("labels"), lit("both"))).distinct().collect()
    sample.foreach(r => assert(r.getString(1) === s"${r.getString(0)}-${r.getString(0)}"))
  }

  test("histogram_quantile interpolates planted cumulative buckets") {
    import spark.implicits._
    // one series per le, cumulative counts 10/25/30, single timestamp
    val planted = Seq(
      ("a", "req_bucket", 100L, "app", Map("le" -> "50"), 10.0),
      ("b", "req_bucket", 100L, "app", Map("le" -> "100"), 25.0),
      ("c", "req_bucket", 100L, "app", Map("le" -> "+Inf"), 30.0))
      .toDF("id", "name", "timestamp", "component", "tags", "value")
    val q50 = PromQl.compile("histogram_quantile(0.5, req_bucket)", planted)
      .select("value").collect().map(_.getDouble(0))
    // rank 15 lands in (50,100]: 50 + 50 * (15-10)/(25-10)
    assert(q50.length === 1 && math.abs(q50.head - (50.0 + 50.0 * 5.0 / 15.0)) < 1e-9)
    val q99 = PromQl.compile("histogram_quantile(0.99, req_bucket)", planted)
      .select("value").collect().map(_.getDouble(0))
    // rank 29.7 lands in +Inf → highest finite boundary
    assert(q99.length === 1 && q99.head === 100.0)
  }

  test("clamp and math functions apply per sample") {
    val v = PromQl.compile("clamp(view_total, 10, 20)", metrics)
      .select("value").collect().map(_.getDouble(0))
    assert(v.nonEmpty && v.forall(x => x >= 10.0 && x <= 20.0))
    val neg = rendered(PromQl.compile("-view_total", metrics))
    val abs0 = rendered(PromQl.compile("abs(-view_total)", metrics))
    assert(abs0 === neg.map { case (n, s, w, x) => (n, s, w, math.abs(x)) })
    // PromQL funcClamp edge semantics (r16 ADVICE): max < min → the
    // EMPTY vector, not max-everywhere
    assert(PromQl.compile("clamp(view_total, 20, 10)", metrics).count() === 0L)
    // a NaN bound propagates NaN (Go math.Min/Max), it never becomes
    // the bound — and the empty-vector check does NOT trigger on NaN
    val nanB = PromQl.compile("clamp(view_total, 0/0, 10)", metrics)
      .select("value").collect().map(_.getDouble(0))
    assert(nanB.nonEmpty && nanB.forall(_.isNaN))
    val nanMin = PromQl.compile("clamp_min(view_total, 0/0)", metrics)
      .select("value").collect().map(_.getDouble(0))
    assert(nanMin.nonEmpty && nanMin.forall(_.isNaN))
    // a NaN VALUE stays NaN through finite bounds (Spark's NaN-greatest
    // least/greatest would have returned the max bound)
    val nanV = PromQl.compile("clamp(view_total * (0/0), 10, 20)", metrics)
      .select("value").collect().map(_.getDouble(0))
    assert(nanV.nonEmpty && nanV.forall(_.isNaN))
    val nanVMax = PromQl.compile("clamp_max(view_total * (0/0), 20)", metrics)
      .select("value").collect().map(_.getDouble(0))
    assert(nanVMax.nonEmpty && nanVMax.forall(_.isNaN))
  }

  test("group_left divides each series by its per-user total") {
    val got = PromQl.compileVector(
      "view_total / on(user) group_left sum by (user) (view_total)",
      metrics)
    // share-of-total: every value in (0, 1]; left identity (name) kept
    val vals = got.select("value").collect().map(_.getDouble(0))
    assert(vals.nonEmpty && vals.forall(v => v > 0 && v <= 1.0 + 1e-12))
    assert(got.select("name").distinct().collect().map(_.getString(0)).toSet === Set("view_total"))
  }

  test("compile errors: unsupported function, scalar-only expression, bad range") {
    assertThrows[PromQlCompileException](PromQl.compile("histogram_avg(x)", metrics))
    assertThrows[PromQlCompileException](PromQl.compile("1 + 2", metrics))
    assertThrows[PromQlCompileException](PromQl.compile("view_total[1h]", metrics))
    assertThrows[PromQlCompileException](
      PromQl.compile("max_over_time(increase(x[1h])[5h:2h])", metrics))
  }

  test("sliding with R == step degenerates to tumbling exactly") {
    val q = "avg_over_time(view_total[1h])"
    assert(rendered(PromQl.compileSliding(q, metrics, 3600L)) ===
      rendered(PromQl.compile(q, metrics, 3600L)))
  }

  test("sliding increase == sum of the four covered 15m tumbling increases") {
    // first-principles: a 1h lookback on the 15m grid covers exactly the
    // four 15m tumbling windows starting at w..w+45m (both sides assign a
    // delta to its later sample's window; decimal sums are associative,
    // so regrouping the addends is exact)
    val inc15 = rendered(PromQl.compile("increase(view_total[15m])", metrics))
    val expected = inc15
      .flatMap { case (n, s, ws, _) => (0 to 3).map(j => (n, s, ws - j * 900L)) }
      .map { case (n, s, w) =>
        val v = inc15.collect {
          case (n2, s2, w2, v2) if n2 == n && s2 == s && w2 >= w && w2 < w + 3600 =>
            BigDecimal(v2)
        }.sum.toDouble
        (n, s, w, BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = rendered(
      PromQl.compileSliding("increase(view_total[1h])", metrics, 900L))
    assert(got.nonEmpty && got === expected)
  }

  test("sliding mode composes mixed ranges on the one step grid") {
    val df = PromQl.compileSliding(
      "increase(error_total[2h]) / (increase(view_total[1h]) > 0)", metrics, 900L)
    val wins = df.select("win_start").distinct().collect().map(_.getLong(0))
    assert(wins.nonEmpty && wins.forall(_ % 900 == 0),
      "every subexpression must land on the 900s evaluation grid")
    assertThrows[PromQlCompileException](
      PromQl.compileSliding("increase(view_total[50m])", metrics, 900L).collect())
  }

  test("predict_linear extrapolates the deriv fit: p(h) - p(0) == slope * h") {
    def byKey(q: String): Map[(String, String, Long), Double] =
      PromQl.compile(q, metrics)
        .select("name", "series", "win_start", "value").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getDouble(3))
        .toMap
    // 24h windows: sf0.001 is sparse — hourly windows rarely hold the
    // two distinct-ts samples a fit needs
    val slope = byKey("deriv(view_total[24h])")
    val p0 = byKey("predict_linear(view_total[24h], 0)")
    val ph = byKey("predict_linear(view_total[24h], 1800)")
    assert(slope.nonEmpty && slope.keySet === p0.keySet && p0.keySet === ph.keySet)
    slope.foreach { case (k, s) =>
      assert(math.abs((ph(k) - p0(k)) - s * 1800.0) <= 1e-6 * (1 + math.abs(s * 1800.0)),
        s"trend family inconsistent at $k")
    }
  }

  test("absent of a never-reported series fills the stream's whole grid") {
    val got = PromQl.compile("""absent(nonexistent_total{foo="bar"})""", metrics)
      .select("name", "series", "win_start", "value").collect()
    val wins =
      metrics.select((col("timestamp") - pmod(col("timestamp"), lit(3600L))).as("w"))
        .agg(min("w"), max("w")).collect().head
    val expectWins = (wins.getLong(0) to wins.getLong(1) by 3600L).toSet
    assert(got.map(_.getLong(2)).toSet === expectWins,
      "the grid must span every window between the stream's oldest and newest")
    assert(got.forall(r => r.getString(0) == "" && r.getString(1) == "foo=bar" &&
      r.getDouble(3) == 1.0))
    // a series present in SOME windows reports only its gaps (fewer rows)
    val gaps = PromQl.compile("""absent(error_total{user="1"})""", metrics).count()
    assert(gaps > 0 && gaps < expectWins.size)
    // absent_over_time with range == step is the same relation
    assert(PromQl.compile("""absent_over_time(nonexistent_total{foo="bar"}[1h])""",
      metrics).count() === expectWins.size.toLong)
  }

  test("holt_winters == Firehose.holtWinters smoothed values") {
    // 24h windows: sf0.001 needs the wide window for >=2-sample groups
    val got = PromQl.compile("holt_winters(view_total[24h], 0.5, 0.25)", metrics)
      .select("series", "win_start", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val exp = Firehose.holtWinters(
        metrics.filter(col("name") === "view_total"), 0.5, 0.25, 86400L)
      .filter(col("smoothed").isNotNull)
      .select("series", "win_start", "smoothed").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got === exp)
    assertThrows[PromQlCompileException](
      PromQl.compile("holt_winters(view_total[1h], 1.5, 0.25)", metrics))
  }

  test("@ pins the baseline window and spreads it across the grid") {
    // a window that actually holds view_total samples at sf0.001
    val pinT = 1705183999L
    val pinWin = pinT - pinT % 3600
    val pinned = PromQl.compile(s"increase(view_total[1h] @ $pinT)", metrics)
      .select("series", "win_start", "value").collect()
    val baseline = PromQl.compile("increase(view_total[1h])", metrics)
      .filter(col("win_start") === pinWin)
      .select("series", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pinned.nonEmpty && baseline.nonEmpty)
    // every pinned row carries the baseline value of its series,
    // whatever evaluation window it lands on
    pinned.foreach { r =>
      assert(r.getDouble(2) === baseline(r.getString(0)),
        s"series ${r.getString(0)} window ${r.getLong(1)}")
    }
    // the spread covers the stream's whole grid for each pinned series
    val wins = metrics
      .select((col("timestamp") - pmod(col("timestamp"), lit(3600L))).as("w"))
      .agg(min("w"), max("w")).collect().head
    val gridN = (wins.getLong(1) - wins.getLong(0)) / 3600 + 1
    assert(pinned.length.toLong === gridN * baseline.size)
    // composable: current-vs-baseline ratio joins per window
    val ratio = PromQl.compile(
      s"increase(view_total[1h]) / (increase(view_total[1h] @ $pinT) > 0)", metrics)
    assert(ratio.count() > 0)
  }

  test("time/scalar/vector: per-window scalars join elementwise") {
    // share-of-total: per window the positive shares sum to 1 (the
    // numerator filter keeps NaN out — Spark evaluates NaN > 0 as TRUE,
    // so filtering after the division would not)
    val share = PromQl.compile(
      "(increase(view_total[1h]) > 0) / scalar(sum(increase(view_total[1h])))", metrics)
    val sums = share.groupBy("win_start").agg(sum(col("value")).as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 1e-9))
    // vector(time()): the grid rendered with the window start as value
    val t = PromQl.compile("vector(time())", metrics).collect()
    assert(t.nonEmpty && t.forall(r =>
      r.getAs[Double]("value") == r.getAs[Long]("win_start").toDouble &&
        r.getAs[String]("series") == ""))
    // scalar(): single-element windows yield the element, several-element
    // windows yield NaN, per PromQL — first-principles per window
    val sc = PromQl.compile("vector(scalar(view_total))", metrics).collect()
      .map(r => r.getAs[Long]("win_start") -> r.getAs[Double]("value")).toMap
    val inst = PromQl.compile("view_total", metrics)
      .groupBy("win_start").agg(count(lit(1)).as("n"), min(col("value")).as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(sc.nonEmpty && inst.exists(_._2._1 > 1) && inst.exists(_._2._1 == 1))
    inst.foreach { case (w, (n, v)) =>
      if (n == 1) assert(sc(w) === v, s"window $w")
      else assert(sc(w).isNaN, s"window $w with $n series must be NaN")
    }
    // per-window scalar arithmetic: time() - time() is the zero scalar
    val z = PromQl.compile("vector(time() - time())", metrics).collect()
    assert(z.nonEmpty && z.forall(_.getAs[Double]("value") == 0.0))
  }

  test("recording rules: a chain equals the directly-composed expression") {
    import graft.promql.PromQlRules
    val outs = PromQlRules.evaluate(
      """# chain: per-user increases, then a grand total over them
        |r:inc = sum by (user) (increase(view_total[1h]))
        |r:total = sum(r:inc)""".stripMargin,
      metrics)
    val chained = outs("r:total")
      .select("win_start", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = PromQl.compile("sum(sum by (user) (increase(view_total[1h])))", metrics)
      .select("win_start", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(chained.nonEmpty && chained === direct)
    // the recorded series carries the RULE's name
    assert(outs("r:inc").select("name").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("r:inc"))
    // landing-ready union covers both rules
    val all = PromQlRules.samples(
      "r:inc = sum by (user) (increase(view_total[1h]))\nr:total = sum(r:inc)",
      metrics)
    assert(all.select("name").distinct().count() === 2L)
    // loud failures: malformed line, duplicate name, bad name
    assertThrows[PromQlCompileException](PromQlRules.parse("just text"))
    assertThrows[PromQlCompileException](PromQlRules.parse("a = up\na = up"))
    assertThrows[PromQlCompileException](PromQlRules.parse("9bad = up"))
  }

  test("alerting rules: for-duration streaks fire only after consecutive windows") {
    import spark.implicits._
    import graft.promql.PromQlRules
    // u1 breaches two CONSECUTIVE hourly windows; u2's two breaches have
    // a gap — only u1's second window fires under `for 1h`
    val planted = Seq(
      ("app", "c_total", Map("user" -> "u1"), 100L, "a", 10.0),
      ("app", "c_total", Map("user" -> "u1"), 3700L, "b", 20.0),
      ("app", "c_total", Map("user" -> "u1"), 7300L, "c", 35.0),
      ("app", "c_total", Map("user" -> "u2"), 200L, "d", 5.0),
      ("app", "c_total", Map("user" -> "u2"), 7400L, "e", 9.0)
    ).toDF("component", "name", "tags", "timestamp", "id", "value")
    val fired = PromQlRules.evaluate(
      "alert A = increase(c_total[1h]) > 0 for 1h", planted)("A")
      .select("series", "win_start").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fired === Set(("user=u1", 7200L)))
    // without `for`, the alert fires at every breach window
    val immediate = PromQlRules.evaluate(
      "alert A = increase(c_total[1h]) > 0", planted)("A")
      .select("series", "win_start").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(immediate ===
      Set(("user=u1", 3600L), ("user=u1", 7200L), ("user=u2", 7200L)))
    // a for-duration off the step grid is refused
    assertThrows[PromQlCompileException](
      PromQlRules.evaluate("alert B = c_total > 0 for 90m", planted))
  }

  test("rule grammar: keep_firing_for, labels and annotations clauses") {
    import graft.promql.PromQlRules
    import graft.promql.PromQlRules.Alert
    val parsed = PromQlRules.parse(
      """alert Hot = rate(c_total[1h]) > 0.5 for 2h keep_firing_for 1h """ +
        """labels {severity="page",team="db"} """ +
        """annotations {summary="rate high {{ $value }}",runbook="https://r"}""")
    val a = parsed.head.asInstanceOf[Alert]
    assert(a.name === "Hot")
    assert(a.expr === "rate(c_total[1h]) > 0.5")
    assert(a.forSec === 7200L && a.keepFiringForSec === 3600L)
    assert(a.labels === Map("severity" -> "page", "team" -> "db"))
    assert(a.annotations === Map(
      "summary" -> "rate high {{ $value }}", "runbook" -> "https://r"))
    // map clauses commute; exposition escapes unescape in values
    val b = PromQlRules.parse(
      """alert B = up annotations {s="x"} labels {a="q\"z"}""")
      .head.asInstanceOf[Alert]
    assert(b.labels === Map("a" -> "q\"z") && b.annotations === Map("s" -> "x"))
    assert(b.forSec === 0L && b.keepFiringForSec === 0L)
    // keep_firing_for without for
    val c = PromQlRules.parse("alert C = up keep_firing_for 5m")
      .head.asInstanceOf[Alert]
    assert(c.expr === "up" && c.forSec === 0L && c.keepFiringForSec === 300L)
    // a non-duration after the keyword belongs to the expression (the
    // bare `for` discipline), and a non-tiling block is not a clause
    val d = PromQlRules.parse("alert D = c_total > x keep_firing_for quickly")
      .head.asInstanceOf[Alert]
    assert(d.expr === "c_total > x keep_firing_for quickly" &&
      d.keepFiringForSec === 0L)
    // duplicate clauses are refused loudly
    assertThrows[PromQlCompileException](PromQlRules.parse(
      """alert E = up labels {a="1"} labels {b="2"}"""))
  }

  test("recording rules take static labels: merged over compiled labels " +
      "(rule wins), part of the recorded identity, round-trippable") {
    import spark.implicits._
    import graft.promql.PromQlRules
    val parsed = PromQlRules.parse(
      """r:x = sum by (user) (view_total) labels {tier="gold",user="all"}""")
      .head.asInstanceOf[PromQlRules.Rule]
    assert(parsed.expr === "sum by (user) (view_total)")
    assert(parsed.labels === Map("tier" -> "gold", "user" -> "all"))
    // clause text round-trips through the parser (escapes included)
    val rt = PromQlRules.clauseText("labels", Map("a" -> "q\"z", "b" -> "x,y"))
    val back = PromQlRules.parse(s"r:y = up$rt").head
      .asInstanceOf[PromQlRules.Rule]
    assert(back.labels === Map("a" -> "q\"z", "b" -> "x,y"))
    // annotations are alert-only
    assertThrows[PromQlCompileException](
      PromQlRules.parse("""r:z = up annotations {s="t"}"""))
    // evaluation: the static label lands on every recorded series (rule
    // value wins over a conflicting compiled label), and a SECOND rule
    // groups on it — the label is recorded identity, not decoration
    val planted = Seq(
      ("app", "c_total", Map("user" -> "u1"), 100L, "a", 5.0),
      ("app", "c_total", Map("user" -> "u2"), 200L, "b", 7.0)
    ).toDF("component", "name", "tags", "timestamp", "id", "value")
    val out = PromQlRules.evaluate(
      """r:v = sum by (user) (c_total) labels {tier="gold"}
        |r:sum = sum by (tier) (r:v)""".stripMargin, planted)
    val rec = out("r:v").select("series", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rec ===
      Map("tier=gold,user=u1" -> 5.0, "tier=gold,user=u2" -> 7.0))
    val total = out("r:sum").select("series", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(total === Map("tier=gold" -> 12.0))
    // a conflicting static label WINS over the compiled one
    val conf = PromQlRules.evaluate(
      """r:c = sum by (user) (c_total{user="u1"}) labels {user="all"}""",
      planted)("r:c").select("series", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(conf === Map("user=all" -> 5.0))
  }

  test("keep_firing_for: the firing state machine on the point grid, " +
      "hand-traced (re-arm without re-pending, gap fill, tail, death)") {
    import spark.implicits._
    import graft.promql.PromQlRules
    // cond(t) = sample at t with value > 0; step 60, lookback 60 makes
    // each grid point see exactly its own sample. for 1m → k = 2;
    // keep_firing_for 2m. Hand trace of the Prometheus state machine:
    //   t:     0   60  120 180 240 300 360 420 480 540 600 660 720
    //   cond:  F   T   T   F   F   F   T   T   F   T   F   F   F
    //   state: -   pnd FIR fir fir -   pnd FIR fir FIR fir fir -
    // (120: streak completes; 180/240: tail of 120; 300: >keep past
    // 120 → dies; 360: fresh pending; 420: completes; 480: gap kept
    // alight by 420; 540: re-arms WITHOUT a new pending period — the
    // keep_firing_for semantics a plain streak cannot express; 600/660:
    // tail of 540; 720: dead.)
    val planted = Seq(
      (0L, "a0", -1.0), (60L, "a1", 11.0), (120L, "a2", 12.0),
      (180L, "a3", -1.0), (240L, "a4", -1.0), (300L, "a5", -1.0),
      (360L, "a6", 13.0), (420L, "a7", 14.0), (480L, "a8", -1.0),
      (540L, "a9", 15.0), (600L, "b0", -1.0), (660L, "b1", -1.0),
      (720L, "b2", -1.0)
    ).map { case (t, id, v) => ("app", "c_total", Map("user" -> "u1"), t, id, v) }
      .toDF("component", "name", "tags", "timestamp", "id", "value")
    def fired(text: String, end: Long): Map[Long, Double] =
      PromQlRules.evaluateRange(text, planted, 0L, end, 60L, lookbackSec = 60L)(
        "K").select("win_start", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = fired("alert K = c_total > 0 for 1m keep_firing_for 2m", 720L)
    // fired points carry the breach value; kept points carry the
    // PRECEDING breach's value (Prometheus keeps the last value while
    // the expression returns nothing)
    assert(got === Map(
      120L -> 12.0, 180L -> 12.0, 240L -> 12.0,
      420L -> 14.0, 480L -> 14.0,
      540L -> 15.0, 600L -> 15.0, 660L -> 15.0))
    // without keep_firing_for the plain streak fires only at completions
    assert(fired("alert K = c_total > 0 for 1m", 720L).keySet ===
      Set(120L, 420L))
    // the tail clamps to the evaluation end
    assert(fired("alert K = c_total > 0 for 1m keep_firing_for 2m", 600L)
      .keySet === Set(120L, 180L, 240L, 420L, 480L, 540L, 600L))
    // off the step grid → loud refusal
    assertThrows[PromQlCompileException](
      fired("alert K = c_total > 0 keep_firing_for 90s", 720L))
  }

  test("keep_firing_for property fuzz: the sessionized plan matches a " +
      "sequential reference state machine on random breach patterns") {
    import spark.implicits._
    import graft.promql.PromQlRules
    val seeds = sys.env.get("GRAFT_FUZZ_SEED")
      .map(s => Seq(s.toLong)).getOrElse(Seq(31L))
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val n = 20
      val step = 60L
      for (iter <- 0 until 25) {
        val k = 1 + rnd.nextInt(3)
        val keepSteps = rnd.nextInt(4)
        // per grid point: Some(v > 0) breach, Some(-1) non-breach sample,
        // None absent — absence and a failing sample must behave alike
        val pattern: Seq[Option[Double]] = (0 until n).map { p =>
          rnd.nextInt(4) match {
            case 0 | 1 => Some(10.0 + p)
            case 2 => Some(-1.0)
            case 3 => None
          }
        }
        val planted = pattern.zipWithIndex.flatMap {
          case (Some(v), p) =>
            Seq(("app", "c_total", Map("user" -> "u1"), p * step, f"s$p%03d", v))
          case (None, _) => Nil
        }.toDF("component", "name", "tags", "timestamp", "id", "value")
        if (pattern.exists(_.exists(_ > 0))) {
          val line = "alert K = c_total > 0" +
            (if (k > 1) s" for ${(k - 1) * step}s" else "") +
            (if (keepSteps > 0) s" keep_firing_for ${keepSteps * step}s" else "")
          val got = PromQlRules.evaluateRange(line, planted, 0L,
              (n - 1) * step, step, lookbackSec = step)("K")
            .select("win_start", "value").collect()
            .map(r => r.getLong(0) -> r.getDouble(1)).toMap
          // the reference: Prometheus's machine, stepped sequentially
          var s = 0
          var firing = false
          var lastTrue = -1
          var lastVal = 0.0
          val want = Map.newBuilder[Long, Double]
          for (p <- 0 until n) {
            val cond = pattern(p).exists(_ > 0)
            if (cond) {
              s += 1
              if (firing || s >= k) {
                firing = true; lastTrue = p; lastVal = pattern(p).get
              }
            } else {
              s = 0
              if (firing && (p - lastTrue) * step > keepSteps * step)
                firing = false
            }
            if (firing) want += (p * step) ->
              (if (cond) pattern(p).get else lastVal)
          }
          assert(got === want.result(),
            s"seed $seed iter $iter k=$k keep=$keepSteps pattern=" +
              pattern.map(_.fold("·")(v => if (v > 0) "T" else "F")).mkString)
        }
      }
    }
  }

  test("many-to-many without group_left raises at runtime") {
    val ex = intercept[Exception] {
      PromQl.compile("sum by (user) (view_total) / on() view_total", metrics)
        .collect()
    }
    assert(ex.getMessage.contains("many-to-many") ||
      Option(ex.getCause).exists(_.getMessage.contains("many-to-many")))
  }

  test("timestamp(sel) is the window's freshest sample time; derived gets win_start") {
    val got = PromQl.compile("timestamp(view_total)", metrics)
      .select("series", "win_start", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = Firehose.tagFilter(metrics).filter(col("name") === "view_total")
      .groupBy(col("labels").getItem("user").as("u"),
        (col("timestamp") - pmod(col("timestamp"), lit(3600L))).cast("long").as("w"))
      .agg(max(col("timestamp")).as("mts"))
      .collect()
      .map(r => (s"user=${r.getString(0)}", r.getLong(1), r.getLong(2).toDouble)).toSet
    assert(got.nonEmpty && got === expected)
    // any non-selector argument's samples are synthetic at eval time
    val derived = PromQl.compile("timestamp(abs(view_total))", metrics)
      .select("win_start", "value").collect()
    assert(derived.nonEmpty && derived.forall(r => r.getDouble(1) == r.getLong(0).toDouble))
  }

  test("calendar family matches java.time's UTC calendar on real sample times") {
    import java.time.{Instant, ZoneOffset}
    def got(q: String): Map[(String, Long), Double] =
      PromQl.compile(q, metrics).select("series", "win_start", "value")
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    val ts = got("timestamp(error_total)")
    assert(ts.nonEmpty)
    def utc(sec: Double) = Instant.ofEpochSecond(sec.toLong).atZone(ZoneOffset.UTC)
    val checks = Map(
      "minute" -> ((s: Double) => utc(s).getMinute.toDouble),
      "hour" -> ((s: Double) => utc(s).getHour.toDouble),
      "day_of_week" -> ((s: Double) => utc(s).getDayOfWeek.getValue % 7.0), // Sunday = 0
      "day_of_month" -> ((s: Double) => utc(s).getDayOfMonth.toDouble),
      "day_of_year" -> ((s: Double) => utc(s).getDayOfYear.toDouble),
      "days_in_month" -> ((s: Double) => utc(s).toLocalDate.lengthOfMonth.toDouble),
      "month" -> ((s: Double) => utc(s).getMonthValue.toDouble),
      "year" -> ((s: Double) => utc(s).getYear.toDouble))
    checks.foreach { case (fn, ref) =>
      val g = got(s"$fn(timestamp(error_total))")
      assert(g.keySet === ts.keySet, fn)
      g.foreach { case (k, v) => assert(v === ref(ts(k)), s"$fn at $k") }
    }
  }

  test("argless hour() is hour(vector(time())): the grid's own window starts") {
    val g = PromQl.compile("hour()", metrics)
      .select("win_start", "value").collect()
    assert(g.nonEmpty && g.forall(r =>
      r.getDouble(1) == (r.getLong(0) % 86400L) / 3600L))
  }

  test("mad_over_time is the exact nested median; the des alias == holt_winters") {
    val got = PromQl.compile("mad_over_time(view_total[1h])", metrics)
      .select("series", "win_start", "value").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    // independent nested-median on the collected multisets
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expected = Firehose.tagFilter(metrics).filter(col("name") === "view_total")
      .select(concat(lit("user="), col("labels").getItem("user")).as("series"),
        (col("timestamp") - pmod(col("timestamp"), lit(3600L))).cast("long").as("w"),
        col("value"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (k, vs) =>
        val xs = vs.map(_._2).toSeq
        val m = median(xs)
        k -> BigDecimal(median(xs.map(x => math.abs(x - m))))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    assert(got.nonEmpty && got === expected)
    val hw = PromQl.compile("holt_winters(view_total[1h], 0.5, 0.25)", metrics)
    val des = PromQl.compile(
      "double_exponential_smoothing(view_total[1h], 0.5, 0.25)", metrics)
    assert(rendered(hw) === rendered(des))
  }

  test("limitk/limit_ratio: deterministic selection, exact complements") {
    def rows(q: String): Set[(String, Long, Double)] =
      PromQl.compile(q, metrics).select("series", "win_start", "value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val all = rows("sum by (user) (increase(view_total[1h]))")
    val k3 = rows("limitk(3, sum by (user) (increase(view_total[1h])))")
    assert(k3.nonEmpty && k3.subsetOf(all))
    assert(k3.groupBy(_._2).values.forall(_.size <= 3))
    // determinism: rank on the canonical series key — first 3 users by
    // string order per window
    k3.groupBy(_._2).foreach { case (w, rs) =>
      val winAll = all.filter(_._2 == w).map(_._1).toSeq.sorted
      assert(rs.map(_._1) === winAll.take(rs.size).toSet, s"window $w")
    }
    // limit_ratio(r) and limit_ratio(r - 1) partition the input exactly
    val half = rows("limit_ratio(0.5, sum by (user) (increase(view_total[1h])))")
    val rest = rows("limit_ratio(-0.5, sum by (user) (increase(view_total[1h])))")
    assert(half.intersect(rest).isEmpty)
    assert((half ++ rest) === all)
    assertThrows[PromQlCompileException](
      PromQl.compile("limit_ratio(1.5, view_total)", metrics))
  }

  test("@ start()/end() pin the span's bound windows, lazily") {
    // literal-equivalence against the stream's GLOBAL min/max hourly
    // windows (start/end resolve from the whole stream's span — a
    // selector with no samples in the bound window pins empty, per the
    // @ rule, which view_total's late start exercises below)
    val labeled = Firehose.tagFilter(metrics)
    val winExpr = (col("timestamp") - pmod(col("timestamp"), lit(3600L))).cast("long")
    val span = labeled.select(winExpr.as("w")).agg(min(col("w")), max(col("w"))).head
    val (w0, w1) = (span.getLong(0), span.getLong(1))
    def rows(q: String) = rendered(PromQl.compile(q, metrics))
    for (q <- Seq("increase(view_total[1h] @ %s)", "error_total @ %s")) {
      assert(rows(q.format("start()")) === rows(q.format(w0)), q)
      assert(rows(q.format("end()")) === rows(q.format(w1)), q)
    }
    // a name actually reporting in the bound window pins non-empty
    val nameAtEnd = labeled.filter(winExpr === w1).select("name").head.getString(0)
    assert(rows(s"$nameAtEnd @ end()").nonEmpty)
    // printer round-trips the forms
    import graft.promql.{PromQlParser, PromQlPrinter}
    val q = "increase(view_total[1h] @ start()) / increase(view_total[1h] @ end())"
    assert(PromQlPrinter.print(PromQlParser.parse(q)) === q)
  }

  test("histogram_* over a range compiles onto the NativeHist kernels exactly") {
    import graft.operators.NativeHist
    val nh = NativeHist.nativeHistogram(
      metrics.filter(col("name") === "view_total")
        .select("component", "name", "timestamp", "value"),
      schema = 0, widthSec = 3600)
    def got(q: String): Set[(String, Long, Double)] =
      promql.PromQl.compile(q, metrics)
        .select("name", "win_start", "value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    def exp(df: org.apache.spark.sql.DataFrame, c: String): Set[(String, Long, Double)] =
      df.select(col("name"), col("win_start"), col(c).cast("double")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got("histogram_quantile(0.9, view_total[1h])")
      === exp(NativeHist.quantile(nh, 0.9), "q_value"))
    assert(got("histogram_count(view_total[1h])")
      === exp(NativeHist.accessors(nh), "h_count"))
    assert(got("histogram_sum(view_total[1h])")
      === exp(NativeHist.accessors(nh), "h_sum"))
    assert(got("histogram_avg(view_total[1h])")
      === exp(NativeHist.accessors(nh), "h_avg"))
    assert(got("histogram_stdvar(view_total[1h])")
      === exp(NativeHist.spread(nh), "h_stdvar"))
    assert(got("histogram_fraction(3, 50, view_total[1h])")
      === exp(NativeHist.fraction(nh, 3.0, 50.0), "fraction"))
    // the classic le path still takes instant-vector arguments; native
    // accessors refuse them loudly
    val e1 = intercept[PromQlCompileException](
      promql.PromQl.compile("histogram_count(view_total)", metrics))
    assert(e1.getMessage.contains("range vector"))
  }

  test("sliding + @-pinned native histograms land on the step grid") {
    import graft.operators.NativeHist
    // sliding: each 900s-step window's histogram covers its [w, w+3600)
    // lookback — first-principles recompute via the same tile assignment
    val got = promql.PromQl.compileSliding(
        "histogram_count(view_total[1h])", metrics, stepSec = 900L)
      .select("win_start", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = metrics.filter(col("name") === "view_total")
      .select(col("component"), col("name"), col("timestamp"), col("value"))
    val ws = (col("timestamp") - pmod(col("timestamp"), lit(900L))).cast("long")
    val exp = NativeHist.accessors(NativeHist.nativeHistogramKeyed(
        base.withColumn("win_start",
          explode(sequence(ws - lit(3600L - 900L), ws, lit(900L))))))
      .select("win_start", "h_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    assert(got.nonEmpty && got === exp)
    // the tumbling-grid count at each R-aligned window agrees with the
    // tumbling compile (a sliding window aligned to the R grid sees the
    // same lookback)
    val tumb = promql.PromQl.compile("histogram_count(view_total[1h])", metrics)
      .select("win_start", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // sliding window w covers [w, w+3600) = tumbling window at w
    tumb.foreach { case (w, v) => assert(got.get(w).contains(v), s"window $w") }
    // @ pins: the histogram computed at the pinned window, spread across
    // the whole evaluation grid — pinned to view_total's own first
    // window (an explicit timestamp; `@ start()` resolves the GLOBAL
    // span's first window, where view_total happens to be absent at this
    // SF — a pin into an empty window is empty, per PromQL, pinned too)
    val firstWin = tumb.keys.min
    val pinned = promql.PromQl.compile(
        s"histogram_count(view_total[1h] @ $firstWin)", metrics)
      .select("win_start", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pinned.nonEmpty)
    assert(pinned.values.toSet === Set(tumb(firstWin)))
    assert(promql.PromQl.compile(
      "histogram_count(view_total[1h] @ start())", metrics).count() === 0L)
  }

  test("rules guardrails: empty rule text and off-grid for-durations refuse") {
    import graft.promql.PromQlRules
    val e1 = intercept[PromQlCompileException](
      PromQlRules.samples("# only a comment\n", metrics))
    assert(e1.getMessage.contains("no rules"))
    // a tumbling-mode for-duration whose expression lands off the step
    // grid would silently never fire — it must refuse instead
    val e2 = intercept[PromQlCompileException](
      PromQlRules.evaluate(
        "alert A = increase(view_total[30m]) > 0 for 2h", metrics,
        stepSec = 3600L))
    assert(e2.getMessage.contains("step grid"))
    // on-grid and sliding forms still evaluate
    assert(PromQlRules.evaluate(
      "alert A = increase(view_total[1h]) > 0 for 2h", metrics,
      stepSec = 3600L).contains("A"))
    assert(PromQlRules.evaluate(
      "alert A = increase(view_total[30m]) > 0 for 1h", metrics,
      stepSec = 900L, sliding = true).contains("A"))
    // a SUBQUERY's output lands on the subquery's own range grid — the
    // guard must check that range, not recurse into the inner
    // expression's ranges: [2h:1h] at a 1h step is off-grid (refuse)
    // even though the inner has no range selector at all …
    val e3 = intercept[PromQlCompileException](
      PromQlRules.evaluate(
        "alert A = avg_over_time(view_total[2h:1h]) > 0 for 1h", metrics,
        stepSec = 3600L))
    assert(e3.getMessage.contains("step grid"))
    // … and [1h:5m] at a 1h step is ON-grid (accept) even though the
    // inner 5m range would be off-grid if it reached the output
    assert(PromQlRules.evaluate(
      "alert A = max_over_time(increase(view_total[5m])[1h:5m]) > 0 for 1h",
      metrics, stepSec = 3600L).contains("A"))
  }

  test("IEEE edges: -0 division, ln of zero/negative, round ties, Inf literal") {
    def vals(q: String): Set[Double] =
      PromQl.compile(q, metrics).select("value").collect()
        .map(_.getDouble(0)).toSet
    // x / -0 is -Inf for positive x (Spark's === equates -0.0 and 0.0;
    // the divisor's sign of zero must survive)
    assert(vals("view_total / -0") === Set(Double.NegativeInfinity))
    assert(vals("view_total / 0") === Set(Double.PositiveInfinity))
    // ln(0) = -Inf, ln(x<0) = NaN — never a silently-vanishing null
    assert(vals("ln(view_total - view_total)") === Set(Double.NegativeInfinity))
    assert(vals("ln(0 - view_total)").forall(_.isNaN))
    // round ties go toward +Inf (floor(v + 0.5)), not away from zero
    assert(vals("round(vector(0 - 2.5))") === Set(-2.0))
    assert(vals("round(vector(2.5))") === Set(3.0))
    // Inf/NaN are number literals, not metric selectors
    assert(PromQl.compile("view_total > Inf", metrics).count() === 0L)
    assert(PromQl.compile("view_total < Inf", metrics).count()
      === PromQl.compile("view_total", metrics).count())
    assert(PromQl.compile("view_total == NaN", metrics).count() === 0L)
    // group modifiers on set operations are refused, per Prometheus
    val e = intercept[PromQlCompileException](
      PromQl.compile("view_total and group_left error_total", metrics))
    assert(e.getMessage.contains("no grouping allowed"))
  }

  test("non-quantile aggregations never pay the value-buffering percentile") {
    for (q <- Seq("sum_over_time(view_total[1h])",
        "sum by (user) (view_total)", "max_over_time(view_total[1h])")) {
      val plan = PromQl.compile(q, metrics).queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("percentile"),
        s"$q buffers the full value multiset")
    }
    // the quantile paths still carry it
    val qp = PromQl.compile("quantile_over_time(0.9, view_total[1h])", metrics)
      .queryExecution.optimizedPlan.toString
    assert(qp.toLowerCase.contains("percentile"))
  }

  test("trigonometric family is bit-exact vs java.lang.Math on the real stream") {
    def keyed(q: String): Map[(String, Long), Double] =
      PromQl.compile(q, metrics).select("series", "win_start", "value")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val base = keyed("view_total")
    assert(base.nonEmpty)
    val fns: Seq[(String, Double => Double)] = Seq(
      "sin" -> math.sin, "cos" -> math.cos, "tan" -> math.tan,
      "asin" -> math.asin, "acos" -> math.acos, "atan" -> math.atan,
      "sinh" -> math.sinh, "cosh" -> math.cosh, "tanh" -> math.tanh,
      "deg" -> math.toDegrees, "rad" -> math.toRadians)
    for ((fn, f) <- fns) {
      val got = keyed(s"$fn(view_total)")
      assert(got.keySet === base.keySet, fn)
      got.foreach { case (k, v) =>
        val w = f(base(k))
        assert((v.isNaN && w.isNaN) || v === w, s"$fn at $k: got $v want $w")
      }
    }
    // gauge values are large counters, so asin/acos are the NaN branch —
    // pin the in-domain arc values through rad-compression too
    val inDomain = keyed("sin(rad(view_total))")
    assert(inDomain.values.forall(v => !v.isNaN && math.abs(v) <= 1.0))
    assert(keyed("asin(sin(rad(view_total)))").values.forall(v => !v.isNaN))
  }

  test("inverse hyperbolics: Go domain edges, no catastrophic cancellation") {
    def vals(q: String): Set[Double] =
      PromQl.compile(q, metrics).select("value").collect()
        .map(_.getDouble(0)).toSet
    // atanh: ±1 -> ±Inf, |x|>1 -> NaN (never a vanishing null row)
    assert(vals("atanh(view_total * 0 + 1)") === Set(Double.PositiveInfinity))
    assert(vals("atanh(view_total * 0 - 1)") === Set(Double.NegativeInfinity))
    assert(vals("atanh(view_total + 2)").forall(_.isNaN)) // all > 1
    // acosh: x < 1 -> NaN; x >= 1 finite and positive
    assert(vals("acosh(view_total * 0 + 0.5)").forall(_.isNaN))
    assert(vals("acosh(view_total + 1.5)").forall(v => v > 0 && !v.isInfinite))
    // asinh is odd and stable for large negatives (the naive
    // log(x + sqrt(x²+1)) form collapses to -Inf long before 1e10)
    val pos = vals("asinh(view_total * 0 + 10000000000)")
    val neg = vals("asinh(view_total * 0 - 10000000000)")
    assert(pos.size === 1 && neg === pos.map(-_) && pos.head < 24.0 &&
      !pos.head.isInfinite)
    // asinh(±0) keeps the sign of zero
    assert(vals("asinh(-(view_total * 0))").map(v => 1.0 / v)
      === Set(Double.NegativeInfinity))
    // FDLIBM range reduction (Go's algorithms), not the naive forms:
    // tiny arguments return x itself (the naive 1±x rounds to 1.0 and
    // yields exactly 0), huge arguments take log(x)+ln2 (the naive x²
    // overflows to +Inf around 1.3e154)
    val ln2 = 0.6931471805599453
    assert(vals("atanh(view_total * 0 + 1e-20)") === Set(1e-20))
    assert(vals("asinh(view_total * 0 + 1e-20)") === Set(1e-20))
    assert(vals("asinh(view_total * 0 + 1e160)")
      === Set(math.log(1e160) + ln2))
    assert(vals("asinh(view_total * 0 - 1e160)")
      === Set(-(math.log(1e160) + ln2)))
    assert(vals("acosh(view_total * 0 + 1e200)")
      === Set(math.log(1e200) + ln2))
    // acosh just above 1: the log1p arm keeps the digits the naive
    // x²-1 cancellation would halve (t derives from the ROUNDED
    // double 1+1e-10, same as the engine's v - 1.0)
    val tAcosh = (1.0 + 1e-10) - 1.0
    assert(vals("acosh(view_total * 0 + 1 + 1e-10)")
      === Set(math.log1p(tAcosh + math.sqrt(2.0 * tAcosh + tAcosh * tAcosh))))
    // and the log1p arms agree bit-for-bit with the FDLIBM spellings
    // in the mid ranges
    assert(vals("atanh(view_total * 0 + 0.25)")
      === Set(0.5 * math.log1p(0.5 + 0.5 * 0.25 / 0.75)))
    assert(vals("atanh(view_total * 0 + 0.9)")
      === Set(0.5 * math.log1p((0.9 + 0.9) / (1.0 - 0.9))))
    assert(vals("asinh(view_total * 0 + 1.5)")
      === Set(math.log1p(1.5 + 1.5 * 1.5 / (1.0 + math.sqrt(1.0 + 1.5 * 1.5)))))
    assert(vals("asinh(view_total * 0 + 100)")
      === Set(math.log(2.0 * 100 + 1.0 / (100 + math.sqrt(100.0 * 100 + 1)))))
  }

  test("non-finite vector values ride aggregation sums, floors and calendars") {
    def vals(q: String): Set[Double] =
      PromQl.compile(q, metrics).select("value").collect()
        .map(_.getDouble(0)).toSet
    // x/0 makes ordinary +Inf vector elements; the decimal sum lanes
    // must carry them as IEEE would, not fail the ANSI cast or
    // silently null them out of the sum
    assert(vals("sum(view_total / 0)") === Set(Double.PositiveInfinity))
    assert(vals("sum by (user) (0 - view_total / 0)")
      === Set(Double.NegativeInfinity))
    assert(vals("avg(view_total / 0)") === Set(Double.PositiveInfinity))
    assert(vals("stddev(view_total / 0)").forall(_.isNaN))
    assert(vals("sum(view_total * NaN)").forall(_.isNaN))
    // the *_over_time and rate/increase lanes via a subquery feed
    assert(vals("sum_over_time((view_total / 0)[1h:1h])")
      === Set(Double.PositiveInfinity))
    // increase over an ALL-Inf series: every delta is Inf − Inf = NaN
    // (single-sample windows contribute their 0.0 first-delta) — the
    // same fold Prometheus's extrapolatedRate lands in
    assert(vals("increase((view_total / 0)[1h:1h])")
      .forall(v => v.isNaN || v == 0.0))
    assert(vals("deriv((view_total / 0)[1h:1h])").forall(_.isNaN))
    // Prometheus max skips NaN unless every sample is (Spark's native
    // max would return NaN whenever one is); min already matches
    assert(vals("max((view_total * NaN) or vector(7))") === Set(7.0))
    assert(vals("max(view_total * NaN)").forall(_.isNaN))
    // floor/ceil/round propagate non-finites (Spark's LongType floor
    // would ANSI-overflow on Inf and zero NaN)
    assert(vals("ceil(view_total / 0)") === Set(Double.PositiveInfinity))
    assert(vals("floor(0 - view_total / 0)") === Set(Double.NegativeInfinity))
    assert(vals("round(view_total / 0, 0.001)") === Set(Double.PositiveInfinity))
    assert(vals("round(view_total * NaN)").forall(_.isNaN))
    // a non-finite value names no calendar point: NaN, never a crash
    assert(vals("hour(view_total / 0)").forall(_.isNaN))
    assert(vals("month(view_total * NaN)").forall(_.isNaN))
  }

  test("big finite values ride the double sidecar, never fail the decimal cast") {
    def keyed(q: String): Map[(String, Long), Double] =
      PromQl.compile(q, metrics).select("series", "win_start", "value")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def vals(q: String): Seq[Double] =
      PromQl.compile(q, metrics).select("value").collect().map(_.getDouble(0)).toSeq
    // gauge·2⁴⁸ exceeds decimal(18,6) (~1e12 cap) for every non-zero
    // gauge — the scaling is an exact exponent shift, so the sidecar's
    // IEEE sum equals 2⁴⁸·(the same values summed in double) and can
    // differ from the exact-decimal small sum only by summation-order
    // ulps
    val Sc = "281474976710656" // 2^48
    def close(a: Double, b: Double): Boolean =
      a == b || math.abs(a - b) <= 1e-12 * math.max(math.abs(a), math.abs(b))
    val big = keyed(s"sum by (user) (view_total * $Sc)")
    val small = keyed("sum by (user) (view_total)")
    assert(big.keySet === small.keySet && big.nonEmpty)
    big.foreach { case (k, v) =>
      assert(!v.isNaN && !v.isInfinite && close(v, small(k) * 2.81474976710656e14), k)
    }
    val bigOt = keyed(s"sum_over_time((view_total * $Sc)[1h:1h])")
    val smallOt = keyed("sum_over_time(view_total[1h:1h])")
    assert(bigOt.keySet === smallOt.keySet && bigOt.nonEmpty)
    bigOt.foreach { case (k, v) =>
      assert(!v.isNaN && !v.isInfinite && close(v, smallOt(k) * 2.81474976710656e14), k)
    }
    // variance/regression read their own double sidecars: finite and
    // scale-consistent (v² leaves the 2^53 exact regime — tolerance)
    val sdBig = vals(s"stddev(view_total * $Sc)")
    val sdSmall = vals("stddev(view_total)")
    assert(sdBig.nonEmpty && sdBig.forall(v => !v.isNaN && !v.isInfinite))
    // the two lanes cancel differently at the noise floor (a
    // near-constant group's tiny variance can clamp to 0 on one side
    // and ~1e-6 on the other) — 1e-5 absolute floor + relative band
    sdBig.sorted.zip(sdSmall.sorted).foreach { case (b, s) =>
      assert(math.abs(b / 2.81474976710656e14 - s) <= 1e-5 + 1e-6 * s,
        s"big=$b small=$s scaled=${b / 2.81474976710656e14}")
    }
    val dvBig = vals(s"deriv((view_total * $Sc)[2h:1h])")
    assert(dvBig.nonEmpty && dvBig.forall(v => !v.isNaN && !v.isInfinite))
    // increase over big-but-finite counters sums its deltas in the
    // sidecar too
    assert(vals(s"increase((view_total * $Sc)[1h:1h])")
      .forall(v => !v.isNaN && !v.isInfinite))
  }

  test("out-of-range quantile phi follows Prometheus, round uses the inverse grid") {
    def vals(q: String): Set[Double] =
      PromQl.compile(q, metrics).select("value").collect()
        .map(_.getDouble(0)).toSet
    // Prometheus: phi > 1 -> +Inf, phi < 0 -> -Inf, NaN -> NaN per
    // present group; Spark's percentile() would fail the whole query
    // at analysis time instead
    assert(vals("quantile_over_time(1.5, view_total[1h])")
      === Set(Double.PositiveInfinity))
    assert(vals("quantile_over_time(0 - 1, view_total[1h])")
      === Set(Double.NegativeInfinity))
    assert(vals("quantile_over_time(NaN, view_total[1h])").forall(_.isNaN))
    assert(vals("quantile(1.5, view_total)") === Set(Double.PositiveInfinity))
    assert(vals("quantile(0 - 0.5, view_total)")
      === Set(Double.NegativeInfinity))
    assert(vals("quantile by (user) (NaN, view_total)").forall(_.isNaN))
    // out-of-range phi keeps the group shape: one row per present group
    assert(PromQl.compile("quantile(2, view_total)", metrics).count()
      === PromQl.compile("quantile(0.5, view_total)", metrics).count())
    // round(v, to) = floor(v·(1/to) + 0.5) / (1/to) — promql/
    // functions.go's inverse spelling, an ulp off floor(v/to + 0.5)·to
    // for non-dyadic to
    val inv = 1.0 / 0.1
    assert(vals("round(vector(0.35), 0.1)")
      === Set(math.floor(0.35 * inv + 0.5) / inv))
    assert(vals("round(vector(12.345678), 0.001)")
      === Set(math.floor(12.345678 * (1.0 / 0.001) + 0.5) / (1.0 / 0.001)))
  }

  test("atan2 binary operator: vector match, zero-sign cases, pi()") {
    import graft.promql.{PromQlParser, PromQlPrinter}
    // vector atan2 vector through the standard match join
    def keyed(q: String): Map[(String, Long), Double] =
      PromQl.compile(q, metrics).select("series", "win_start", "value")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val l = keyed("view_total")
    val r = keyed("error_total")
    val got = keyed("view_total atan2 error_total")
    val want = l.keySet.intersect(r.keySet)
      .map(k => k -> math.atan2(l(k), r(k))).toMap
    assert(got.nonEmpty && got === want)
    // vector atan2 scalar with a negative-zero y: Go's sign-of-zero cases
    assert(keyed("-(view_total * 0) atan2 -1").values.toSet === Set(-math.Pi))
    assert(keyed("(view_total * 0) atan2 -1").values.toSet === Set(math.Pi))
    assert(keyed("(view_total * 0) atan2 1").values.toSet === Set(0.0))
    assert(keyed("(view_total * 0) atan2 -(view_total * 0)").values.toSet
      === Set(math.Pi))
    // scalar fold and the pi() literal
    assert(keyed("vector(-0 atan2 -1)").values.toSet === Set(-math.Pi))
    assert(keyed("vector(pi())").values.toSet === Set(math.Pi))
    assert(PromQl.compile("vector(pi())", metrics).count()
      === PromQl.compile("vector(1)", metrics).count())
    // NaN operands propagate
    assert(keyed("(view_total % 0) atan2 1").values.forall(_.isNaN))
    // printer round-trips the operator with matching modifiers
    val ast = PromQlParser.parse("view_total atan2 on (user) error_total")
    assert(PromQlParser.parse(PromQlPrinter.print(ast)) === ast)
  }

  test("comparisons are IEEE on NaN: only != keeps NaN rows (filter and bool)") {
    // x % 0 is NaN for every sample (the compiler's own arith), so the
    // whole relation is the NaN operand Prometheus's Go-float semantics
    // define: ==/</>/<=/>= drop it, != keeps it — Spark's SQL ordering
    // (NaN == NaN true, NaN greatest) must never leak through cmpPred
    val base = PromQl.compile("view_total % 0", metrics)
    val n = base.count()
    assert(n > 0 && base.filter(!isnan(col("value"))).count() === 0L)
    for (op <- Seq("==", ">", "<", ">=", "<="))
      assert(PromQl.compile(s"(view_total % 0) $op 0", metrics).count() === 0L,
        s"NaN $op 0 must filter out")
    assert(PromQl.compile("(view_total % 0) != 0", metrics).count() === n)
    val boolVals = PromQl.compile("(view_total % 0) >= bool 0", metrics)
      .select("value").collect().map(_.getDouble(0)).toSet
    assert(boolVals === Set(0.0))
    val neqVals = PromQl.compile("(view_total % 0) != bool 0", metrics)
      .select("value").collect().map(_.getDouble(0)).toSet
    assert(neqVals === Set(1.0))
  }

  test("sort_desc orders the output relation by value descending") {
    val vals = PromQl.compile("sort_desc(sum by (user) (increase(view_total[1h])))",
        metrics)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(vals.nonEmpty && vals === vals.sorted(Ordering[Double].reverse))
    val asc = PromQl.compile("sort(sum by (user) (increase(view_total[1h])))", metrics)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(asc === vals.sorted)
  }

  test("ts_of_* family: Prometheus tie and NaN update rules; last == timestamp") {
    import spark.implicits._
    // u1: a value tie at the max (9 at t=200 and t=300) — the `>=` in
    // Prometheus's loop keeps the LATEST occurrence; u2: NaN samples
    // never beat a non-NaN one; u3: an all-NaN window reports its
    // latest sample's timestamp (every iteration fires `isNaN(maxVal)`)
    val planted = Seq(
      ("app", "g_total", Map("user" -> "u1"), 100L, "a", 5.0),
      ("app", "g_total", Map("user" -> "u1"), 200L, "b", 9.0),
      ("app", "g_total", Map("user" -> "u1"), 300L, "c", 9.0),
      ("app", "g_total", Map("user" -> "u2"), 100L, "d", Double.NaN),
      ("app", "g_total", Map("user" -> "u2"), 200L, "e", 7.0),
      ("app", "g_total", Map("user" -> "u2"), 300L, "f", Double.NaN),
      ("app", "g_total", Map("user" -> "u3"), 100L, "g", Double.NaN),
      ("app", "g_total", Map("user" -> "u3"), 250L, "h", Double.NaN)
    ).toDF("component", "name", "tags", "timestamp", "id", "value")
    def tsOf(fn: String): Map[String, Double] =
      PromQl.compile(s"$fn(g_total[1h])", planted)
        .select("series", "value").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(tsOf("ts_of_max_over_time") ===
      Map("user=u1" -> 300.0, "user=u2" -> 200.0, "user=u3" -> 250.0))
    assert(tsOf("ts_of_min_over_time") ===
      Map("user=u1" -> 100.0, "user=u2" -> 200.0, "user=u3" -> 250.0))
    assert(tsOf("ts_of_last_over_time") ===
      Map("user=u1" -> 300.0, "user=u2" -> 300.0, "user=u3" -> 250.0))
    // on the real stream with range == step, the freshest sample's
    // timestamp is exactly what timestamp(sel) returns
    val lastTs = rendered(PromQl.compile("ts_of_last_over_time(view_total[1h])", metrics))
    val tsSel = rendered(PromQl.compile("timestamp(view_total)", metrics))
    assert(lastTs.nonEmpty && lastTs === tsSel)
  }

  test("info(): data-label join on (instance, job), pass-through, conflicts raise") {
    import spark.implicits._
    def row(name: String, tags: Map[String, String], ts: Long, id: String, v: Double) =
      ("app", name, tags, ts, id, v)
    val planted = Seq(
      // v: two series with identifying labels, one without a match
      row("req_total", Map("instance" -> "i1", "job" -> "api", "path" -> "/a"), 100L, "a", 1.0),
      row("req_total", Map("instance" -> "i2", "job" -> "api"), 110L, "b", 2.0),
      row("req_total", Map("instance" -> "i9", "job" -> "api"), 120L, "c", 3.0),
      // target_info for i1/i2 (i9 has none)
      row("target_info", Map("instance" -> "i1", "job" -> "api",
        "cluster" -> "us", "path" -> "/info-side"), 130L, "d", 1.0),
      row("target_info", Map("instance" -> "i2", "job" -> "api",
        "cluster" -> "eu"), 140L, "e", 1.0),
      // an alternate info metric for the __name__-selector case
      row("build_info", Map("instance" -> "i2", "job" -> "api",
        "version" -> "2.1"), 150L, "f", 1.0)
    ).toDF("component", "name", "tags", "timestamp", "id", "value")
    def series(q: String): Set[String] =
      PromQl.compile(q, planted).select("series").collect().map(_.getString(0)).toSet
    // default selector = target_info; v's own `path` wins over the info
    // side's; i9 passes through unchanged
    assert(series("info(req_total)") === Set(
      "cluster=us,instance=i1,job=api,path=/a",
      "cluster=eu,instance=i2,job=api",
      "instance=i9,job=api"))
    // a data-label matcher restricts the copied labels to its names AND
    // the considered series to those matching it
    assert(series("""info(req_total, {cluster="eu"})""") === Set(
      "instance=i1,job=api,path=/a",
      "cluster=eu,instance=i2,job=api",
      "instance=i9,job=api"))
    // __name__ matchers pick the info metric
    assert(series("""info(req_total, {__name__="build_info"})""") === Set(
      "instance=i1,job=api,path=/a",
      "instance=i2,job=api,version=2.1",
      "instance=i9,job=api"))
    // two info series on the same (instance, job) with conflicting data
    // labels raise; identical data labels deduplicate silently
    val conflict = planted.unionByName(Seq(
      row("target_info", Map("instance" -> "i1", "job" -> "api",
        "cluster" -> "ap"), 160L, "g", 1.0)
    ).toDF("component", "name", "tags", "timestamp", "id", "value"))
    val e = intercept[Exception](
      PromQl.compile("info(req_total)", conflict).collect())
    assert(e.getMessage.contains("conflicting data labels"))
    // DISJOINT data labels across matching info series MERGE (the
    // multi-exporter case): a second i2 info metric contributes env
    // while the first keeps cluster — the sample copies both
    val merged = planted.unionByName(Seq(
      row("env_info", Map("instance" -> "i2", "job" -> "api",
        "env" -> "prod"), 165L, "m", 1.0)
    ).toDF("component", "name", "tags", "timestamp", "id", "value"))
    assert(PromQl.compile(
      """info(req_total, {__name__=~"target_info|env_info"})""", merged)
      .select("series").collect().map(_.getString(0)).toSet === Set(
      "cluster=us,instance=i1,job=api,path=/a",
      "cluster=eu,env=prod,instance=i2,job=api",
      "instance=i9,job=api"))
    // an UNCONSUMED conflict is harmless (Prometheus only errors when a
    // sample joins the conflicted group): i7 has two disagreeing info
    // series but no req_total sample — everything else still answers
    val idle = planted.unionByName(Seq(
      row("target_info", Map("instance" -> "i7", "job" -> "api",
        "cluster" -> "us"), 160L, "g", 1.0),
      row("target_info", Map("instance" -> "i7", "job" -> "api",
        "cluster" -> "ap"), 161L, "h", 1.0)
    ).toDF("component", "name", "tags", "timestamp", "id", "value"))
    assert(PromQl.compile("info(req_total)", idle)
      .select("series").collect().map(_.getString(0)).toSet === Set(
      "cluster=us,instance=i1,job=api,path=/a",
      "cluster=eu,instance=i2,job=api",
      "instance=i9,job=api"))
    // distinct info series whose COPIED labels agree (a restricted
    // selector copies only `cluster`, and both i2 series carry eu)
    // deduplicate silently instead of raising
    val dup = planted.unionByName(Seq(
      row("target_info", Map("instance" -> "i2", "job" -> "api",
        "cluster" -> "eu", "zone" -> "b"), 170L, "h", 1.0)
    ).toDF("component", "name", "tags", "timestamp", "id", "value"))
    assert(PromQl.compile("""info(req_total, {cluster=~".+"})""", dup)
      .select("series").collect().map(_.getString(0)).toSet === Set(
      "cluster=us,instance=i1,job=api,path=/a",
      "cluster=eu,instance=i2,job=api",
      "instance=i9,job=api"))
  }

  test("sort_by_label orders naturally: digit runs compare as integers") {
    import spark.implicits._
    val planted = Seq(
      ("app", "g_total", Map("user" -> "pod10"), 100L, "a", 1.0),
      ("app", "g_total", Map("user" -> "pod2"), 100L, "b", 2.0),
      ("app", "g_total", Map("user" -> "pod1x"), 100L, "c", 3.0),
      ("app", "g_total", Map("user" -> "abc"), 100L, "d", 4.0),
      ("app", "g_total", Map.empty[String, String], 100L, "e", 5.0)
    ).toDF("component", "name", "tags", "timestamp", "id", "value")
    def order(q: String): Seq[String] =
      PromQl.compile(q, planted).select("series").collect().map(_.getString(0)).toSeq
    // absent label keys as "" (first), then lexicographic segments with
    // numeric digit runs: pod1x < pod2 < pod10
    assert(order("""sort_by_label(g_total, "user")""") ===
      Seq("", "user=abc", "user=pod1x", "user=pod2", "user=pod10"))
    assert(order("""sort_by_label_desc(g_total, "user")""") ===
      Seq("user=pod10", "user=pod2", "user=pod1x", "user=abc", ""))
    // string args parse, print and round-trip through the text front-end
    val printed = PromQl.print(PromQl.parse("""sort_by_label(x, "a", "b")"""))
    assert(PromQl.print(PromQl.parse(printed)) === printed)
    // digit runs past any fixed pad width still rank numerically (the
    // length-prefixed key: a longer stripped run is strictly greater),
    // and leading zeros key equal-then-tiebreak
    val big = Seq(
      ("app", "g_total", Map("user" -> ("v" + "9" * 30)), 100L, "a", 1.0),
      ("app", "g_total", Map("user" -> ("v1" + "0" * 30)), 100L, "b", 2.0),
      ("app", "g_total", Map("user" -> "v2"), 100L, "c", 3.0),
      ("app", "g_total", Map("user" -> "v002"), 100L, "d", 4.0)
    ).toDF("component", "name", "tags", "timestamp", "id", "value")
    val got = PromQl.compile("""sort_by_label(g_total, "user")""", big)
      .select("series").collect().map(_.getString(0)).toSeq
    // v2 == v002 numerically (series-key tiebreak: "v002" < "v2"), then
    // 30 nines, then 1 followed by 30 zeros (31 digits — one longer)
    assert(got === Seq("user=v002", "user=v2",
      "user=v" + "9" * 30, "user=v1" + "0" * 30))
  }

  test("Prometheus 3.x quoted UTF-8 names evaluate end-to-end: selectors, " +
      "grouping, and the registry fast path") {
    import spark.implicits._
    import graft.promql.{PromQlVersioned, PromRegistry}
    val dotted = Seq(
      ("app", "my.metric", Map("label.x" -> "v", "host zone" -> "eu 1"), 100L, "a", 1.0),
      ("app", "my.metric", Map("label.x" -> "w", "host zone" -> "us 1"), 110L, "b", 2.0),
      ("app", "plain", Map("label.x" -> "v"), 120L, "c", 4.0)
    ).toDF("component", "name", "tags", "timestamp", "id", "value")
    def vals(q: String): Set[Double] =
      PromQl.compile(q, dotted).select("value").collect().map(_.getDouble(0)).toSet
    // quoted metric-name shorthand and quoted label matchers
    assert(vals("""{"my.metric"}""") === Set(1.0, 2.0))
    assert(vals("""{"my.metric", "label.x"="v"}""") === Set(1.0))
    assert(vals("""{"label.x"=~"v|w"}""") === Set(1.0, 2.0, 4.0))
    assert(vals("""sum by ("host zone") ({"my.metric"})""") === Set(1.0, 2.0))
    val grouped = PromQl.compile(
        """sum by ("host zone") ({"my.metric"})""", dotted)
      .select("series").collect().map(_.getString(0)).toSet
    assert(grouped === Set("host zone=eu 1", "host zone=us 1"))
    // the registry instant fold takes the same quoted shapes at zero
    // landed files, byte-identical to the landed compile
    PromRegistry.reset()
    val root = java.nio.file.Files.createTempDirectory("graft-utf8")
      .toFile.getAbsolutePath
    PromQlVersioned.land(Firehose.tagFilter(dotted)
      .select("component", "name", "labels", "timestamp", "id", "value"), root)
    for (q <- Seq("""{"my.metric"}""",
        """sum by ("host zone") ({"my.metric", "label.x"=~"v|w"})""")) {
      val fast = PromRegistry.instantFastPath(spark, root, q, 120L, 300L)
      assert(fast.nonEmpty, q)
      val slow = graft.promql.PromQlVersioned.compileInstantVector(
        spark, root, q, 120L, lookbackSec = 300L)
      def r(df: DataFrame): Set[String] = df
        .select(col("component"), col("name"),
          Firehose.seriesKey(col("labels")).as("s"), col("win_start"), col("value"))
        .collect()
        .map(x => s"${x.getString(0)}|${x.getString(1)}|${x.getString(2)}|" +
          s"${x.getLong(3)}|${x.getDouble(4)}")
        .toSet
      assert(r(fast.get) === r(slow), q)
    }
  }
}
