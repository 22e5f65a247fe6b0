package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Firehose
import graft.promql.{PromQl, PromQlParser, PromQlVersioned}
import graft.sources.Versioned

/** Time-range file pruning for the PromQL path ([[PromQlVersioned]]):
  * an instant query over a landed metric corpus must READ only the
  * files whose timestamp stats intersect the query's visibility — and
  * return exactly the rows the full-scan compile returns. The landing
  * is split into four time-quarter commits of one file each, so the
  * scan census is the pruning decision, directly observable through
  * `inputFiles`.
  */
class PromQlVersionedSpec extends SparkSuite {

  private lazy val metrics = Firehose.tagFilter(
    Firehose.metricsFromEvents(spark, sfDir))
    .select("component", "name", "labels", "timestamp", "id", "value")

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  // quarter cut points of the stream's time span
  private lazy val (q1, q2, q3, tMax) = {
    val r = metrics.agg(
      expr("percentile(timestamp, 0.25)"), expr("percentile(timestamp, 0.5)"),
      expr("percentile(timestamp, 0.75)"), max(col("timestamp"))).head()
    (r.getDouble(0).toLong, r.getDouble(1).toLong, r.getDouble(2).toLong,
      r.getLong(3))
  }

  /** Four one-file commits, one per time quarter. */
  private lazy val root: String = {
    val r = tmp("pql-land")
    val cuts = Seq(Long.MinValue, q1, q2, q3, Long.MaxValue)
    cuts.sliding(2).foreach { case Seq(lo, hi) =>
      PromQlVersioned.land(
        metrics.filter(col("timestamp") > lo && col("timestamp") <= hi)
          .coalesce(1), r)
    }
    r
  }

  private def files(df: DataFrame): Set[String] =
    df.inputFiles.map(_.split('/').last).toSet

  private lazy val allFiles: Set[String] =
    files(Versioned.latest(spark, root))

  private def rows(df: DataFrame): Set[(String, String, Long, Double)] =
    df.select("name", "series", "win_start", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("a 2-day instant query over the landed month reads ONE file of four") {
    val q = "sum by (user) (increase(view_total[2d]))"
    assert(allFiles.size === 4)
    val pruned = PromQlVersioned.prunedMetrics(spark, root, q, tMax)
    // visibility (tMax − 2d, tMax] touches only the newest ~7.5-day quarter
    assert(files(pruned).size === 1)
    assert(files(pruned).subsetOf(allFiles))
    // rows identical to the full-scan compile
    val got = rows(PromQlVersioned.compileInstant(spark, root, q, tMax))
    assert(got.nonEmpty && got ===
      rows(PromQl.compileInstant(q, Versioned.latest(spark, root), tMax)))
  }

  test("an @-pinned query's scan collapses to the pin's quarter") {
    val pin = (q1 + q2) / 2 // mid second quarter
    val q = s"sum_over_time(view_total[1d] @ $pin)"
    val pruned = PromQlVersioned.prunedMetrics(spark, root, q, tMax)
    // fully pinned: nothing near t is read — only the pin's file
    assert(files(pruned).size === 1)
    val got = rows(PromQlVersioned.compileInstant(spark, root, q, tMax))
    assert(got.nonEmpty && got ===
      rows(PromQl.compileInstant(q, Versioned.latest(spark, root), tMax)))
  }

  test("an offset selector prunes to the shifted lookback") {
    // aim the lookback window into the third quarter
    val off = tMax - (q2 + q3) / 2
    val q = s"view_total offset ${off}s"
    val pruned = PromQlVersioned.prunedMetrics(
      spark, root, q, tMax, lookbackSec = 86400L)
    assert(files(pruned).size === 1)
    val got = rows(PromQlVersioned.compileInstant(
      spark, root, q, tMax, lookbackSec = 86400L))
    assert(got.nonEmpty && got ===
      rows(PromQl.compileInstant(
        q, Versioned.latest(spark, root), tMax, lookbackSec = 86400L)))
  }

  test("universe-dependent shapes fall back to the full read") {
    for (q <- Seq("absent(nosuch_total)", "vector(1)",
        "time() - 0 * sum(view_total)")) {
      val pruned = PromQlVersioned.prunedMetrics(spark, root, q, tMax)
      assert(files(pruned) === allFiles, q)
    }
    // a pinned selector INSIDE a subquery spreads over the observed
    // grid (pinSpread/streamGrid) — universe-shaped, so no pruning
    val sq = s"sum_over_time((view_total @ $q1)[2d:1d])"
    assert(PromQlVersioned.needsUniverse(PromQlParser.parse(sq)))
    assert(files(PromQlVersioned.prunedMetrics(spark, root, sq, tMax)) === allFiles)
    // rows still exactly the full compile's (fallback is the same scan)
    assert(rows(PromQlVersioned.compileInstant(spark, root, sq, tMax)) ===
      rows(PromQl.compileInstant(sq, Versioned.latest(spark, root), tMax)))
  }

  test("grid-mode range pruning: a week's dashboard span reads its quarter") {
    // window-local shape over the last week of the landed month
    val (start, end, step) = (tMax - 7 * 86400L, tMax, 86400L)
    val q = "sum by (user) (sum_over_time(view_total[1d]))"
    val pruned = PromQlVersioned.gridRangeMetrics(spark, root, q, start, end, step)
    assert(files(pruned).size < allFiles.size && files(pruned).nonEmpty)
    val got = rows(PromQlVersioned.compileGridRangeVector(
      spark, root, q, start, end, step)
      .select(col("name"), Firehose.seriesKey(col("labels")).as("series"),
        col("win_start"), col("value")))
    val want = rows(PromQl.compileSliding(q, Versioned.latest(spark, root), step)
      .filter(col("win_start") >= lit(start) && col("win_start") <= lit(end)))
    assert(got.nonEmpty && got === want)
  }

  test("grid pruning falls back for the series-lag family and pins") {
    val (start, end, step) = (tMax - 2 * 86400L, tMax, 86400L)
    // rate/increase reach back to the previous sample anywhere in
    // history (the engine's crossing-delta model) — unprunable
    for (q <- Seq("increase(view_total[1d])",
        "sum by (user) (rate(view_total[1d]))",
        s"sum_over_time(view_total[1d] @ $q1)")) {
      assert(files(PromQlVersioned.gridRangeMetrics(
        spark, root, q, start, end, step)) === allFiles, q)
    }
    // and the fallback's rows still match the direct compile
    val q = "increase(view_total[1d])"
    assert(rows(PromQlVersioned.compileGridRangeVector(spark, root, q, start, end, step)
      .select(col("name"), Firehose.seriesKey(col("labels")).as("series"),
        col("win_start"), col("value"))) ===
      rows(PromQl.compileSliding(q, Versioned.latest(spark, root), step)
        .filter(col("win_start") >= lit(start) && col("win_start") <= lit(end))))
  }

  test("gridBounds interval arithmetic (forward-covering windows)") {
    import graft.promql.PromQlVersioned.gridBounds
    val (s, e) = (1000000L, 1086400L)
    // instant selector on the step grid: [start, end + step)
    assert(gridBounds(PromQlParser.parse("x_total"), s, e, 900) === (s, e + 900))
    // range selector: [start − off, end + R − off)
    assert(gridBounds(
      PromQlParser.parse("sum_over_time(x_total[1h] offset 2h)"), s, e, 900) ===
      (s - 7200, e + 3600 - 7200))
    // subquery: outer window range-selects inner points at the INNER step
    assert(gridBounds(
      PromQlParser.parse("max_over_time(min_over_time(x_total[30m])[2h:15m])"),
      s, e, 900) === (s, e + 7200 + 1800))
  }

  test("fuzz: pruned reads are row-identical to full scans (instant + grid legs)") {
    // the bounds walks are interval arithmetic over the AST — exactly
    // the kind of code an off-by-one hides in (two gaps were found by
    // hand during construction: the fold-seed widening and the
    // pin-under-subquery universe dependence), so a seeded differential
    // fuzz guards them: random expressions drawing every bound-relevant
    // construct, random evaluation anchors, pruned == full row sets
    val seed = sys.env.getOrElse("GRAFT_FUZZ_SEED", "20260815").toLong
    val iters = sys.env.getOrElse("GRAFT_FUZZ_ITERS", "15").toInt
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val sels = Seq("view_total", "click_total", """view_total{user=~"1.*"}""",
      """{user="7"}""")
    val ranges = Seq("12h", "1d", "2d")
    val overs = Seq("sum_over_time", "min_over_time", "max_over_time",
      "count_over_time", "avg_over_time")
    def modifier(): String = rnd.nextInt(4) match {
      case 0 => ""
      case 1 => s" offset ${pick(Seq("1h", "1d", "-2h"))}"
      case 2 => s" @ ${q1 + rnd.nextInt(((q3 - q1) / 2).toInt.max(1))}"
      case 3 => s" @ ${pick(Seq("start()", "end()"))}"
    }
    def leaf(): String = rnd.nextInt(6) match {
      case 0 => s"${pick(sels)}${modifier()}"
      case 1 | 2 => s"${pick(overs)}(${pick(sels)}[${pick(ranges)}]${modifier()})"
      case 3 => s"increase(${pick(sels)}[${pick(ranges)}]${modifier()})"
      case 4 => s"absent(${pick(sels)}${modifier()})"
      // the lag OVER a subquery: window-interior since the review catch,
      // so its pruning reach is the subquery walk's — exercised here
      case 5 => s"increase((${pick(sels)})[2d:1d])"
    }
    def expr(depth: Int): String =
      if (depth == 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => leaf()
        case 1 => s"sum by (user) (${expr(depth - 1)})"
        case 2 => s"(${expr(depth - 1)}) ${pick(Seq("+", "or", "unless"))} (${expr(depth - 1)})"
        case 3 => s"${pick(overs)}((${leaf()})[2d:1d])"
      }
    val full = Versioned.latest(spark, root)
    // a drawn expression may be ILLEGAL (e.g. a 12h range inside a
    // sliding-step evaluation that doesn't tile) — then both legs must
    // refuse with the SAME error; Either-parity covers both worlds
    def attempt(f: => Set[(String, String, Long, Double)]) =
      try Right(f)
      catch { case e: graft.promql.PromQlCompileException => Left(e.getMessage) }
    (1 to iters).foreach { i =>
      val q = expr(1 + rnd.nextInt(2))
      // instant leg at a random (often non-aligned) anchor
      val t = q1 + (rnd.nextLong().abs % (tMax - q1).max(1))
      val lb = pick(Seq(3600L, 86400L))
      val got = attempt(rows(
        PromQlVersioned.compileInstant(spark, root, q, t, lookbackSec = lb)))
      val want = attempt(rows(PromQl.compileInstant(q, full, t, lookbackSec = lb)))
      assert(got === want, s"instant iter $i: $q @ $t lb=$lb")
      // grid leg over a random sub-span (12h step: every drawn range
      // and the [2d:1d] subquery tile it)
      val step = 43200L
      val start = q1 + (rnd.nextLong().abs % (q3 - q1).max(1))
      val end = start + step * (1 + rnd.nextInt(7))
      val gq = expr(1)
      if (!gq.contains("@")) { // grid pins fall back — exercised above
        val g = attempt(rows(
          PromQlVersioned.compileGridRangeVector(spark, root, gq, start, end, step)
            .select(col("name"), Firehose.seriesKey(col("labels")).as("series"),
              col("win_start"), col("value"))))
        val w = attempt(rows(PromQl.compileSliding(gq, full, step)
          .filter(col("win_start") >= lit(start) && col("win_start") <= lit(end))))
        assert(g === w, s"grid iter $i: $gq [$start, $end]")
      }
      // point-range leg: the PRUNED point-grid compile == the full-scan
      // one (pins and increase are prunable here, unlike grid mode)
      val pg = attempt(rows(
        PromQlVersioned.compileRangeVector(spark, root, q, start, end, step, lb)
          .select(col("name"), Firehose.seriesKey(col("labels")).as("series"),
            col("win_start"), col("value"))))
      val pw = attempt(rows(
        PromQl.compileRange(q, full, start, end, step, lookbackSec = lb)))
      assert(pg === pw, s"point-range iter $i: $q [$start, $end]")
    }
  }

  test("point-range pruning: pins and increase ARE prunable per point") {
    val (start, end, step) = (tMax - 2 * 86400L, tMax, 86400L)
    // window-interior increase: backward-bounded visibility per point
    val q = "sum by (user) (increase(view_total[1d]))"
    val pruned = PromQlVersioned.pointRangeMetrics(spark, root, q, start, end)
    assert(files(pruned).size === 1, "increase should prune under point semantics")
    val got = rows(PromQlVersioned.compileRangeVector(
      spark, root, q, start, end, step)
      .select(col("name"), Firehose.seriesKey(col("labels")).as("series"),
        col("win_start"), col("value")))
    assert(got.nonEmpty && got ===
      rows(PromQl.compileRange(q, Versioned.latest(spark, root), start, end, step)))
    // a pinned call spreads over the LITERAL point sequence — its scan
    // collapses to the pin's quarter, even under a range
    val pin = (q1 + q2) / 2
    val pq = s"sum_over_time(view_total[1d] @ $pin)"
    assert(files(PromQlVersioned.pointRangeMetrics(
      spark, root, pq, start, end)).size === 1)
    val pGot = rows(PromQlVersioned.compileRangeVector(
      spark, root, pq, start, end, step)
      .select(col("name"), Firehose.seriesKey(col("labels")).as("series"),
        col("win_start"), col("value")))
    assert(pGot.nonEmpty && pGot ===
      rows(PromQl.compileRange(pq, Versioned.latest(spark, root), start, end, step)))
  }

  test("instantBounds interval arithmetic") {
    import graft.promql.PromQlVersioned.instantBounds
    val t = 1000000L
    // instant selector: (t − lookback, t]
    assert(instantBounds(PromQlParser.parse("x_total"), t) === (t - 300, t))
    // range + offset: [t − off − R, t − off]
    assert(instantBounds(PromQlParser.parse("rate(x_total[1h] offset 2h)"), t) ===
      (t - 7200 - 3600, t - 7200))
    // fully pinned: the pin's interval alone
    assert(instantBounds(
      PromQlParser.parse(s"sum_over_time(x_total[1h] @ ${t - 86400})"), t) ===
      (t - 86400 - 3600, t - 86400))
    // pinned + relative: one covering interval
    assert(instantBounds(PromQlParser.parse(
      s"x_total + sum_over_time(x_total[1h] @ ${t - 86400})"), t) ===
      (t - 86400 - 3600, t))
    // subquery: range + inner step slop both sides + inner reach
    assert(instantBounds(
      PromQlParser.parse("max_over_time(rate(x_total[30m])[2h:15m])"), t) ===
      (t - 7200 - 900 - 1800, t + 900))
    // negative offset reaches forward
    assert(instantBounds(PromQlParser.parse("x_total offset -10m"), t) ===
      (t + 600 - 300, t + 600))
  }
}
