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

  test("grid rate/increase PRUNE via the head seed; pins still fall back") {
    val (start, end, step) = (tMax - 2 * 86400L, tMax, 86400L)
    // rate/increase reach back to the previous sample anywhere in
    // history (the engine's crossing-delta model) — but that is ONE
    // sample per series: the scan reads the span's quarter, and the
    // crossing delta is seeded from gridLagHeads (a local relation —
    // it adds no scanned files to the plan)
    for (q <- Seq("increase(view_total[1d])",
        "sum by (user) (rate(view_total[1d]))")) {
      assert(files(PromQlVersioned.gridRangeMetrics(
        spark, root, q, start, end, step)).size === 1, q)
    }
    // a grid-mode pin spreads over the OBSERVED span — still unprunable
    assert(files(PromQlVersioned.gridRangeMetrics(
      spark, root, s"sum_over_time(view_total[1d] @ $q1)",
      start, end, step)) === allFiles)
    // and the seeded rows exactly match the full-scan compile
    for (q <- Seq("increase(view_total[1d])",
        "sum by (user) (rate(view_total[1d]))")) {
      assert(rows(PromQlVersioned.compileGridRangeVector(spark, root, q, start, end, step)
        .select(col("name"), Firehose.seriesKey(col("labels")).as("series"),
          col("win_start"), col("value"))) ===
        rows(PromQl.compileSliding(q, Versioned.latest(spark, root), step)
          .filter(col("win_start") >= lit(start) && col("win_start") <= lit(end))), q)
    }
  }

  test("head-seed census: a dense landing's probe reads ONE margin file") {
    // ten daily one-file commits of three hourly-sampled series — the
    // production shape (live series, append-ordered landing). A 2-day
    // dashboard's head probe must read exactly the newest pre-span
    // file: every series' predecessor is there, the walk settles in
    // its first (single-file) batch, and nine days of history are
    // never listed.
    val r = tmp("pql-heads")
    val day = 86400L
    import spark.implicits._
    val dense = spark.range(10 * 24).select(
      explode(array(lit("a"), lit("b"), lit("c"))).as("u"),
      (col("id") * 3600L).as("timestamp"))
      .select(lit("app").as("component"), lit("cpu_total").as("name"),
        map(lit("user"), col("u")).as("labels"), col("timestamp"),
        concat(col("u"), col("timestamp")).as("id"),
        (col("timestamp") / 100.0).as("value"))
    (0 until 10).foreach { d =>
      PromQlVersioned.land(
        dense.filter(col("timestamp") >= lit(d * day) &&
          col("timestamp") < lit((d + 1) * day)).coalesce(1), r)
    }
    val v = Versioned.latestVersion(r)
    val lo = 8 * day + 7200L // a span starting inside day 9's file
    val span = Versioned.prunedRead(spark, r, v,
      Seq(("timestamp", lo.toDouble, (10 * day).toDouble)))
    val (heads, read) = PromQlVersioned.gridLagHeads(spark, r, v, lo, span)
    assert(read.size === 1)
    // one predecessor per series, each the hour before the bound
    val h = heads.select(col("timestamp"),
      Firehose.seriesKey(col("labels")).as("s")).collect()
    assert(h.length === 3 && h.forall(_.getLong(0) === lo - 3600L))
    // and on the shared sparse landing the walk still stops early: it
    // reads a newest-first prefix, never the whole candidate list
    val (start2, end2, step2) = (tMax - 2 * 86400L, tMax, 86400L)
    val ast = PromQlParser.parse("increase(view_total[1d])")
    val (lo2, _) = PromQlVersioned.gridBounds(ast, start2, end2, step2)
    val v2 = Versioned.latestVersion(root)
    val span2 = Versioned.prunedRead(spark, root, v2,
      Seq(("timestamp", lo2.toDouble, Double.MaxValue)))
    val (h2, read2) = PromQlVersioned.gridLagHeads(spark, root, v2, lo2, span2)
    assert(read2.size < allFiles.size) // sparse series: 3 of 4 quarters
    assert(h2.select(col("timestamp")).collect().forall(_.getLong(0) < lo2))
  }

  test("cached heads: a repeat request at the same (version, bound) reads zero files") {
    val r = tmp("pql-headmemo")
    val day = 86400L
    val dense = spark.range(3 * 24).select(
      explode(array(lit("a"), lit("b"), lit("c"))).as("u"),
      (col("id") * 3600L).as("timestamp"))
      .select(lit("app").as("component"), lit("cpu_total").as("name"),
        map(lit("user"), col("u")).as("labels"), col("timestamp"),
        concat(col("u"), col("timestamp")).as("id"),
        (col("timestamp") / 100.0).as("value"))
    // series d exists ONLY in day 2 — in-span, no predecessor
    val dOnly = spark.range(24).select(
      lit("app").as("component"), lit("cpu_total").as("name"),
      map(lit("user"), lit("d")).as("labels"),
      (lit(2 * day) + col("id") * 3600L).as("timestamp"),
      concat(lit("d"), col("id")).as("id"),
      lit(1.0).as("value"))
    (0 until 3).foreach { d =>
      val slice = dense.filter(col("timestamp") >= lit(d * day) &&
        col("timestamp") < lit((d + 1) * day))
      PromQlVersioned.land(
        (if (d == 2) slice.unionByName(dOnly) else slice).coalesce(1), r)
    }
    val v = Versioned.latestVersion(r)
    val lo = 2 * day
    val span = Versioned.prunedRead(spark, r, v,
      Seq(("timestamp", lo.toDouble, (3 * day).toDouble)))
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(Firehose.seriesKey(col("labels")).as("s"), col("timestamp"))
        .collect().map(x => s"${x.getString(0)}@${x.getLong(1)}").sorted.toSeq
    // first request over a SUBSET of the span's series pays the walk
    val sub = span.filter(element_at(col("labels"), "user").isin("a", "b"))
    val (h1, c1) = PromQlVersioned.cachedLagHeads(spark, r, v, lo, sub)
    assert(c1.nonEmpty)
    assert(rowsOf(h1) === rowsOf(
      PromQlVersioned.gridLagHeads(spark, r, v, lo, sub)._1))
    // a repeat of the same request reads ZERO files, answer unchanged
    val (h2, c2) = PromQlVersioned.cachedLagHeads(spark, r, v, lo, sub)
    assert(c2 === Nil)
    assert(rowsOf(h2) === rowsOf(h1))
    // a wider span fills INCREMENTALLY: the walk runs for the unseen
    // series (c settles; d memoizes its no-predecessor answer)...
    val (h3, c3) = PromQlVersioned.cachedLagHeads(spark, r, v, lo, span)
    assert(c3.nonEmpty)
    assert(rowsOf(h3) === rowsOf(
      PromQlVersioned.gridLagHeads(spark, r, v, lo, span)._1))
    assert(h3.filter(element_at(col("labels"), "user") === "d").count() === 0)
    // ...and then the full span is covered too
    assert(PromQlVersioned.cachedLagHeads(spark, r, v, lo, span)._2 === Nil)
    // an APPEND bumps the version — a new key, the walk runs again
    PromQlVersioned.land(dOnly.withColumn("timestamp",
      col("timestamp") + lit(day)).coalesce(1), r)
    val v2 = Versioned.latestVersion(r)
    val span2 = Versioned.prunedRead(spark, r, v2,
      Seq(("timestamp", lo.toDouble, (4 * day).toDouble)))
    assert(PromQlVersioned.cachedLagHeads(spark, r, v2, lo, span2)._2.nonEmpty)
  }

  test("a far pin splits the scan: pin's file + lookback's file, nothing between") {
    val pin = (q1 + q2) / 2 // mid second quarter
    val q = s"sum_over_time(view_total[1d] @ $pin) / sum_over_time(view_total[1d])"
    val pruned = PromQlVersioned.prunedMetrics(spark, root, q, tMax)
    // two disjoint intervals → exactly two of the four quarter files
    assert(files(pruned).size === 2)
    val got = rows(PromQlVersioned.compileInstant(spark, root, q, tMax))
    assert(got.nonEmpty && got ===
      rows(PromQl.compileInstant(q, Versioned.latest(spark, root), tMax)))
  }

  test("instant-mode subquery increase prunes with the head seed") {
    // the inner increase evaluates on the tumbling grid (crossing-delta
    // lag) — previously a full-scan fallback, now span + head seed
    val q = "sum_over_time((increase(view_total[12h]))[1d:12h])"
    val pruned = PromQlVersioned.prunedMetrics(spark, root, q, tMax)
    assert(files(pruned).size < allFiles.size)
    val got = rows(PromQlVersioned.compileInstant(spark, root, q, tMax))
    assert(got.nonEmpty && got ===
      rows(PromQl.compileInstant(q, Versioned.latest(spark, root), tMax)))
  }

  test("retention: expire drops wholly-aged files, keeps straddlers, vacuum reclaims") {
    val r = tmp("pql-retain")
    val day = 86400L
    import spark.implicits._
    val rows = (0 until 6 * 24).map { h =>
      ("app", "cpu_total", Map("host" -> "a"), h * 3600L, s"id$h",
        h.toDouble)
    }.toDF("component", "name", "labels", "timestamp", "id", "value")
    // three 2-day commits of one file each
    (0 until 3).foreach { d =>
      PromQlVersioned.land(rows.filter(
        col("timestamp") >= lit(d * 2 * day) &&
          col("timestamp") < lit((d + 1) * 2 * day)).coalesce(1), r)
    }
    assert(files(Versioned.latest(spark, r)).size === 3)
    val before = Versioned.latestVersion(r)
    // cutoff INSIDE the second file's range: file 1 (max < cutoff)
    // drops; file 2 STRADDLES and stays whole — Prometheus block
    // retention semantics (old rows linger until their file ages out)
    val v = PromQlVersioned.expire(r, 3 * day)
    assert(v === before + 1)
    val kept = Versioned.latest(spark, r)
    assert(files(kept).size === 2)
    assert(kept.count() === 4 * 24)
    assert(kept.agg(min(col("timestamp"))).head().getLong(0) === 2 * day)
    // the previous version still time-travels exactly
    assert(Versioned.asOf(spark, r, before).count() === 6 * 24)
    // nothing left to expire below the same cutoff → no empty commit
    assert(PromQlVersioned.expire(r, 3 * day) === -1L)
    // vacuum past the expired version reclaims the dropped file's bytes
    val pool = new java.io.File(r, "_files")
    val nBefore = pool.listFiles().length
    Versioned.vacuum(r, keepLast = 1)
    assert(pool.listFiles().length === nBefore - 1)
    assert(Versioned.latest(spark, r).count() === 4 * 24)
  }

  test("retention property fuzz: expiry is monotone, cutoff-sound, and query-transparent") {
    // random multi-commit landings × random cutoffs; three invariants
    // that hold WITHOUT modeling file assignment: (a) expiry only ever
    // removes rows (monotone), (b) every removed row is older than the
    // cutoff (file-granular soundness — survivors may include older
    // rows from straddling files, removed rows may not include newer
    // ones), (c) the pruned instant compile over the expired landing
    // still equals the full-scan compile (retention and pruning share
    // the stats and must stay consistent)
    val seed = sys.env.getOrElse("GRAFT_FUZZ_SEED", "20260815").toLong
    val rnd = new scala.util.Random(seed)
    import spark.implicits._
    (1 to 3).foreach { iter =>
      val r = tmp(s"pql-retfuzz$iter")
      val span = 10 * 86400L
      val data = (0 until 400).map { i =>
        ("app", "m_total", Map("u" -> (i % 5).toString),
          rnd.nextLong().abs % span, f"id$i%04d", rnd.nextInt(1000) / 10.0)
      }.toDF("component", "name", "labels", "timestamp", "id", "value")
      // 2-5 commits of random slices (overlapping ranges allowed — the
      // straddle case is the point)
      val nCommits = 2 + rnd.nextInt(4)
      (0 until nCommits).foreach { _ =>
        val lo = rnd.nextLong().abs % span
        val hi = lo + rnd.nextLong().abs % (span - lo).max(1)
        val slice = data.filter(col("timestamp") >= lit(lo) &&
          col("timestamp") <= lit(hi))
        if (slice.limit(1).collect().nonEmpty) PromQlVersioned.land(slice, r)
      }
      if (Versioned.latestVersion(r) >= 0) {
        def all: Set[(Long, String)] = Versioned.latest(spark, r)
          .select(col("timestamp"), col("id")).collect()
          .map(x => (x.getLong(0), x.getString(1))).toSet
        val before = all
        val cutoff = rnd.nextLong().abs % (span + 86400L)
        PromQlVersioned.expire(r, cutoff)
        val after = all
        assert(after.subsetOf(before), s"iter $iter: expiry added rows")
        val removed = before -- after
        assert(removed.forall(_._1 < cutoff),
          s"iter $iter: removed a row at/after cutoff $cutoff")
        assert(before.filter(_._1 >= cutoff).subsetOf(after),
          s"iter $iter: lost a row at/after cutoff $cutoff")
        // query transparency over the expired landing
        val t = span
        val q = "sum by (u) (count_over_time(m_total[5d]))"
        assert(rows(PromQlVersioned.compileInstant(spark, r, q, t)) ===
          rows(PromQl.compileInstant(q, Versioned.latest(spark, r), t)),
          s"iter $iter: pruned != full after expiry")
      }
    }
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
    // sliding-step evaluation that doesn't tile) or REFUSED at runtime
    // (the engine's many-to-many vector-match raise — data-dependent,
    // so pruning must not change whether it fires) — then both legs
    // must refuse with the SAME error; Either-parity covers both worlds
    def attempt(f: => Set[(String, String, Long, Double)]) =
      try Right(f)
      catch {
        case e: graft.promql.PromQlCompileException => Left(e.getMessage)
        case e: org.apache.spark.SparkThrowable
            if e.getCondition == "USER_RAISED_EXCEPTION" =>
          // the many-to-many refusal names the violating SIDE; when BOTH
          // sides violate, which check fires first is physical-plan-
          // order-dependent — and pruning changes the plan legally. The
          // parity pin is "refused for the same REASON", not "same plan
          // order", so the side word normalizes (caught by the 200-iter
          // soak at seed 141421: `x + x` with a multi-series x raised
          // "right" pruned and "left" full)
          Left(e.asInstanceOf[Throwable].getMessage
            .replaceFirst("(left|right) side has multiple series",
              "a side has multiple series"))
      }
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

  test("pruning + head seeds survive small-file compaction of the landing") {
    // the landing's own maintenance must be invisible to every pruned
    // path: bin-pack the two SMALLEST quarter files into one merged file
    // (whose stats are the union — possibly a wide or disjoint-union
    // range, the adversarial stats shape), leave the others as-is, and
    // every pruned compile must stay row-identical to the full scan —
    // including the manifest-walking head seed and the far-pin split
    val rC = tmp("pql-compactprune")
    val cuts = Seq(Long.MinValue, q1, q2, q3, Long.MaxValue)
    cuts.sliding(2).foreach { case Seq(lo, hi) =>
      PromQlVersioned.land(
        metrics.filter(col("timestamp") > lo && col("timestamp") <= hi)
          .coalesce(1), rC)
    }
    val v0 = Versioned.latestVersion(rC)
    val sizes = Versioned.manifest(rC, v0)
      .map(e => new java.io.File(rC, e.path).length()).sorted
    val vC = Versioned.compactSmall(spark, rC, maxBytes = sizes(1))
    assert(vC === v0 + 1)
    assert(Versioned.manifest(rC, vC).size === 3)
    val full = Versioned.latest(spark, rC)
    val pin = (q1 + q2) / 2
    for (q <- Seq(
        "sum by (user) (increase(view_total[1d]))",
        s"sum_over_time(view_total[1d] @ $pin) / sum_over_time(view_total[1d])",
        "max_over_time((increase(view_total[12h]))[2d:1d])")) {
      assert(rows(PromQlVersioned.compileInstant(spark, rC, q, tMax)) ===
        rows(PromQl.compileInstant(q, full, tMax)), s"instant: $q")
    }
    // grid leg: the head seed walks the COMPACTED manifest
    val (start, end, step) = (tMax - 2 * 86400L, tMax, 43200L)
    val gq = "increase(view_total[1d])"
    assert(rows(
      PromQlVersioned.compileGridRangeVector(spark, rC, gq, start, end, step)
        .select(col("name"), Firehose.seriesKey(col("labels")).as("series"),
          col("win_start"), col("value"))) ===
      rows(PromQl.compileSliding(gq, full, step)
        .filter(col("win_start") >= lit(start) && col("win_start") <= lit(end))),
      s"grid: $gq")
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
    // subquery: the inner evaluates on the GRID (forward-covering
    // windows) — selected inner windows w ∈ (t − 2h, t], each touching
    // samples [w, w + 30m): reach (t − 2h, t + 30m)
    assert(instantBounds(
      PromQlParser.parse("max_over_time(rate(x_total[30m])[2h:15m])"), t) ===
      (t - 7200, t + 1800))
    // negative offset reaches forward
    assert(instantBounds(PromQlParser.parse("x_total offset -10m"), t) ===
      (t + 600 - 300, t + 600))
  }
}
