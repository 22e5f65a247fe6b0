package graft.promql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Versioned

/** The PromQL path over a LANDED [[Versioned]] metric corpus, with
  * TIME-RANGE FILE PRUNING: the landed corpus is the 100 TB object of
  * this engine, and an instant query's visibility is finite by
  * construction — each selector sees `(t − lookback, t]` (or
  * `(t − R, t]`, shifted by `offset`, re-anchored by `@`) — so a
  * 1-hour query over a year of landed metrics must read HOURS of
  * files, not the year. [[land]] appends scrape batches with per-file
  * `timestamp` range stats (manifest metadata — no read-time cost),
  * and [[compileInstant]] walks the parsed expression to its exact
  * sample-visibility bounds and routes the scan through
  * [[Versioned.prunedRead]]: files whose stats block lies outside the
  * bounds are never listed to the reader. Results are IDENTICAL to the
  * full-scan compile — the bounds are an over-approximation of every
  * selector's own window filter.
  *
  * The bounds walk ([[instantBounds]]) is interval arithmetic over the
  * AST: an unpinned selector needs `[t − offset − ext, t − offset]`
  * (`ext` = the lookback delta for instant selectors, `R` for range
  * selectors) — folded into a (back, fwd) reach around `t`; an
  * `@`-pinned selector contributes the ABSOLUTE interval around its
  * pin (`start()`/`end()` both resolve to `t` — an instant query's
  * range is the point itself); a subquery widens its inner expression's
  * reach by the subquery range plus one inner step (tumbling-grid
  * slop on both sides). The final span is one covering interval — a
  * far-away `@` pin widens it rather than splitting it (manifest
  * pruning takes one conjunctive range; a pinned dashboard query's
  * pins cluster near its evaluation time in practice).
  *
  * The one shape that cannot prune: expressions whose value depends on
  * the COMPONENT UNIVERSE — `absent`/`absent_over_time` (report
  * components with nothing present), `time()`/`vector()` (one row per
  * observed component) — where dropping a file could drop a component
  * observed only outside the span. Those fall back to the full
  * version read, detected by [[needsUniverse]] and pinned by spec.
  */
object PromQlVersioned {

  /** Append a scrape batch to the landing at `root` with per-file
    * `timestamp` range stats (the pruning index — manifest metadata,
    * written once per file at commit time). Expects the engine's
    * labeled metric shape `(component, name, labels, timestamp, id,
    * value)`; feed [[graft.operators.Firehose.tagFilter]] output.
    */
  def land(df: DataFrame, root: String): Long =
    Versioned.appendCommit(df, root, statsCols = Seq("timestamp"))

  /** Does the expression's value depend on the component universe
    * (components with samples only OUTSIDE the pruned span)? Those
    * expressions read the full version — pruning could change rows.
    */
  def needsUniverse(e: PromExpr): Boolean = e match {
    case Call(fn, args) =>
      fn == "absent" || fn == "absent_over_time" ||
        fn == "time" || fn == "vector" || args.exists(needsUniverse)
    case Agg(_, expr, param, _) =>
      needsUniverse(expr) || param.exists(needsUniverse)
    case Binary(_, l, r, _, _) => needsUniverse(l) || needsUniverse(r)
    case Neg(inner) => needsUniverse(inner)
    // a subquery's inner expression evaluates in GRID mode, where an
    // `@`-pinned selector spreads its pinned value across the
    // component's OBSERVED window span (pinSpread over streamGrid) —
    // that span is itself universe-shaped, so pruning could drop grid
    // windows a component earned only from out-of-span samples. The
    // same grid evaluation gives an inner `rate`/`increase` the
    // FULL-SERIES crossing-delta lag — unbounded back-reach, also
    // unprunable (caught by the pruning fuzz on
    // `sum_over_time((increase(x[2d] offset 1h))[2d:1d])`)
    case Subquery(inner, _, _) =>
      hasPin(inner) || hasSeriesLag(inner) || needsUniverse(inner)
    case RangeSelector(sel, _) => needsUniverse(sel)
    case _: VectorSelector | _: NumberLit | _: StringLit => false
  }

  private def hasPin(e: PromExpr): Boolean = e match {
    case sel: VectorSelector => sel.atSec.nonEmpty
    case RangeSelector(sel, _) => sel.atSec.nonEmpty
    case Call(_, args) => args.exists(hasPin)
    case Agg(_, expr, param, _) => hasPin(expr) || param.exists(hasPin)
    case Binary(_, l, r, _, _) => hasPin(l) || hasPin(r)
    case Neg(inner) => hasPin(inner)
    case Subquery(inner, _, _) => hasPin(inner)
    case _: NumberLit | _: StringLit => false
  }

  /** An expression's sample visibility: the interval RELATIVE to its
    * evaluation point (`None` when every selector is `@`-anchored), plus
    * the absolute intervals its pinned selectors need.
    */
  private case class Reach(
      rel: Option[(Long, Long)], pinned: Seq[(Long, Long)]) {
    def union(o: Reach): Reach = {
      val merged = (rel, o.rel) match {
        case (Some((a, b)), Some((c, d))) =>
          Some((math.min(a, c), math.max(b, d)))
        case (some @ Some(_), None) => some
        case (None, other) => other
      }
      Reach(merged, pinned ++ o.pinned)
    }
    def widen(slop: Long): Reach =
      Reach(rel.map { case (lo, hi) => (lo - slop, hi + slop) },
        pinned.map { case (lo, hi) => (lo - slop, hi + slop) })
  }
  private val NoReach = Reach(None, Nil)

  /** The closed sample-timestamp interval an instant evaluation of
    * `expr` at `tSec` can touch — a superset of every selector's own
    * window, so pruning to it never changes results.
    */
  def instantBounds(
      expr: PromExpr, tSec: Long,
      lookbackSec: Long = 300L, subqueryStepSec: Long = 3600L): (Long, Long) =
    pointBounds(expr, tSec, tSec, lookbackSec, subqueryStepSec)

  /** The closed sample interval a POINT-GRID evaluation over
    * `[startSec, endSec]` can touch — [[instantBounds]] generalized:
    * every point's backward reach anchors the relative interval to the
    * span (`[start + lo, end + hi]`), pins stay absolute, and
    * `start()`/`end()` resolve to the range bounds (the point-grid
    * rule).
    */
  def pointBounds(
      expr: PromExpr, startSec: Long, endSec: Long,
      lookbackSec: Long = 300L, subqueryStepSec: Long = 3600L): (Long, Long) = {
    def resolvePin(a: Long): Long =
      if (a == PromQlAst.AtStart) startSec
      else if (a == PromQlAst.AtEnd) endSec
      else a
    def selReach(sel: VectorSelector, ext: Long): Reach = sel.atSec match {
      case Some(a) =>
        val base = resolvePin(a) - sel.offsetSec
        Reach(None, Seq((base - ext, base)))
      case None =>
        Reach(Some((-sel.offsetSec - ext, -sel.offsetSec)), Nil)
    }
    def walk(e: PromExpr): Reach = e match {
      case sel: VectorSelector => selReach(sel, lookbackSec)
      case RangeSelector(sel, r) => selReach(sel, r)
      case Subquery(inner, r, step) =>
        val s = step.getOrElse(subqueryStepSec)
        // the outer range selects inner grid points in (t − r, t]; the
        // inner tumbling windows around those points add one step of
        // slop each side, and the inner expression's own reach rides on
        // every selected point. The subquery's range anchors at the
        // evaluation time, so the reach is relative regardless of the
        // inner shape (a fully-pinned inner is universe-shaped and
        // never reaches pruning anyway).
        val w = walk(inner).widen(s)
        val (ilo, ihi) = w.rel.getOrElse((0L, 0L))
        Reach(Some((ilo - r, ihi)), w.pinned)
      case Call(_, args) => args.map(walk).foldLeft(NoReach)(_ union _)
      case Agg(_, inner, param, _) =>
        walk(inner) union param.map(walk).getOrElse(NoReach)
      case Binary(_, l, r, _, _) => walk(l) union walk(r)
      case Neg(inner) => walk(inner)
      case _: NumberLit | _: StringLit => NoReach
    }
    val r = walk(expr)
    // a fully-pinned expression (every selector `@`-anchored) needs
    // nothing near the span — its scan collapses to the pins alone, the
    // case the far-lookback dashboards (`metric @ <last week>`) want
    val rels = r.rel.map { case (lo, hi) => (startSec + lo, endSec + hi) }.toSeq
    val all =
      if (rels.isEmpty && r.pinned.isEmpty)
        Seq((startSec - lookbackSec, endSec))
      else rels ++ r.pinned
    (all.map(_._1).min, all.map(_._2).max)
  }

  /** The metric relation an instant evaluation at `tSec` reads: the
    * file-pruned span when the expression's bounds are finite and
    * universe-independent, the full version otherwise. Exposed so
    * PlanSpec can pin the pruned scan's file census.
    */
  def prunedMetrics(
      spark: SparkSession, root: String, query: String, tSec: Long,
      lookbackSec: Long = 300L, subqueryStepSec: Long = 3600L): DataFrame = {
    val ast = PromQlParser.parse(query)
    val v = Versioned.latestVersion(root)
    require(v >= 0, s"no committed versions in $root")
    if (needsUniverse(ast)) Versioned.asOf(spark, root, v)
    else {
      val (lo, hi) = instantBounds(ast, tSec, lookbackSec, subqueryStepSec)
      Versioned.prunedRead(spark, root, v,
        Seq(("timestamp", lo.toDouble, hi.toDouble)))
    }
  }

  // ───────────────────── grid (query_range) pruning ─────────────────────

  /** Does the expression contain `rate`/`increase` — the one family the
    * GRID evaluation computes with a FULL-SERIES lag (the window's first
    * delta reaches back to the previous sample anywhere in history, the
    * engine's documented crossing-delta model)? Unbounded back-reach —
    * no file cut is sound. (The INSTANT evaluation's increase is
    * window-interior and prunes fine; a rate dashboard that wants the
    * pruned read asks the instant endpoint, which is what Prometheus
    * itself evaluates per point.)
    */
  def hasSeriesLag(e: PromExpr): Boolean = e match {
    case Call(fn, args) =>
      fn == "rate" || fn == "increase" || args.exists(hasSeriesLag)
    case Agg(_, expr, param, _) =>
      hasSeriesLag(expr) || param.exists(hasSeriesLag)
    case Binary(_, l, r, _, _) => hasSeriesLag(l) || hasSeriesLag(r)
    case Neg(inner) => hasSeriesLag(inner)
    case Subquery(inner, _, _) => hasSeriesLag(inner)
    case _ => false
  }

  /** The closed sample interval a GRID evaluation restricted to windows
    * `win_start ∈ [startSec, endSec]` can touch, for the prunable shapes
    * (no pins — grid-mode pinSpread is universe-shaped — and no
    * series-lag family). Grid windows cover FORWARD: a window `w` of
    * width R holds samples in `[w, w + R)`, so selectors reach
    * `[start − off, end + ext − off)`.
    */
  def gridBounds(
      expr: PromExpr, startSec: Long, endSec: Long,
      stepSec: Long, subqueryStepSec: Long = 3600L): (Long, Long) = {
    def walk(e: PromExpr, step: Long): (Long, Long) = e match {
      case sel: VectorSelector =>
        (-sel.offsetSec, step - sel.offsetSec)
      case RangeSelector(sel, r) =>
        (-sel.offsetSec, r - sel.offsetSec)
      case Subquery(inner, r, s) =>
        // the outer window w range-selects inner grid points in
        // [w, w + r); the inner expression's reach rides on each point
        // at ITS step
        walk(inner, s.getOrElse(subqueryStepSec)) match {
          case Empty => Empty
          case (ilo, ihi) => (ilo, r + ihi)
        }
      case Call(_, args) => merge(args.map(walk(_, step)))
      case Agg(_, inner, param, _) =>
        merge(walk(inner, step) +: param.map(walk(_, step)).toSeq)
      case Binary(_, l, r, _, _) => merge(Seq(walk(l, step), walk(r, step)))
      case Neg(inner) => walk(inner, step)
      // a selector-free subtree reaches nowhere — the EMPTY interval,
      // which must not widen a sibling's bound (a literal beside an
      // offset selector would otherwise drag the interval back to 0)
      case _: NumberLit | _: StringLit => Empty
    }
    walk(expr, stepSec) match {
      case Empty => (startSec, endSec + stepSec) // literal-only: one grid cell
      case (lo, hi) => (startSec + lo, endSec + hi)
    }
  }

  private val Empty: (Long, Long) = (Long.MaxValue, Long.MinValue)

  /** Interval union that ignores [[Empty]] members. */
  private def merge(rs: Seq[(Long, Long)]): (Long, Long) = {
    val real = rs.filterNot(_ == Empty)
    if (real.isEmpty) Empty
    else (real.map(_._1).min, real.map(_._2).max)
  }

  /** The metric relation the engine's step-GRID evaluation over
    * `[startSec, endSec]` reads: pruned when the shape allows
    * (universe-independent, pin-free, lag-free), the full version
    * otherwise.
    */
  def gridRangeMetrics(
      spark: SparkSession, root: String, query: String,
      startSec: Long, endSec: Long, stepSec: Long,
      subqueryStepSec: Long = 3600L): DataFrame = {
    val ast = PromQlParser.parse(query)
    val v = Versioned.latestVersion(root)
    require(v >= 0, s"no committed versions in $root")
    if (needsUniverse(ast) || hasPin(ast) || hasSeriesLag(ast))
      Versioned.asOf(spark, root, v)
    else {
      val (lo, hi) = gridBounds(ast, startSec, endSec, stepSec, subqueryStepSec)
      Versioned.prunedRead(spark, root, v,
        Seq(("timestamp", lo.toDouble, hi.toDouble)))
    }
  }

  /** The engine's step-grid (windowed) evaluation over the landing,
    * file-pruned to the requested span, restricted to
    * `win_start ∈ [startSec, endSec]` — the labels-map relation.
    */
  def compileGridRangeVector(
      spark: SparkSession, root: String, query: String,
      startSec: Long, endSec: Long, stepSec: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    PromQlCompiler.compileSlidingVector(query,
      gridRangeMetrics(spark, root, query, startSec, endSec, stepSec), stepSec)
      .filter(col("win_start") >= lit(startSec) && col("win_start") <= lit(endSec))
  }

  /** The metric relation a POINT-GRID (Prometheus `query_range`)
    * evaluation over `[startSec, endSec]` reads. Point evaluation is
    * strictly MORE prunable than the engine grid: every point's
    * visibility is finite and backward-anchored, top-level pins spread
    * over a LITERAL point sequence (no observed-span dependence), and
    * increase/rate are window-interior per point — so the fallbacks
    * reduce to exactly the instant rules ([[needsUniverse]]: the
    * component-universe family plus pins/lag UNDER subqueries, whose
    * inner still evaluates in grid mode).
    */
  def pointRangeMetrics(
      spark: SparkSession, root: String, query: String,
      startSec: Long, endSec: Long,
      lookbackSec: Long = 300L, subqueryStepSec: Long = 3600L): DataFrame = {
    val ast = PromQlParser.parse(query)
    val v = Versioned.latestVersion(root)
    require(v >= 0, s"no committed versions in $root")
    if (needsUniverse(ast)) Versioned.asOf(spark, root, v)
    else {
      val (lo, hi) = pointBounds(ast, startSec, endSec, lookbackSec, subqueryStepSec)
      Versioned.prunedRead(spark, root, v,
        Seq(("timestamp", lo.toDouble, hi.toDouble)))
    }
  }

  /** [[PromQl.compileRange]] (point-grid Prometheus `query_range`
    * semantics) over the landing, file-pruned to the queried span —
    * the labels-map relation.
    */
  def compileRangeVector(
      spark: SparkSession, root: String, query: String,
      startSec: Long, endSec: Long, stepSec: Long,
      lookbackSec: Long = 300L, extrapolate: Boolean = false): DataFrame =
    PromQlCompiler.compileRangeVector(query,
      pointRangeMetrics(spark, root, query, startSec, endSec, lookbackSec),
      startSec, endSec, stepSec, lookbackSec, extrapolate = extrapolate)

  /** [[PromQl.compileInstant]] over the landing at `root`, reading only
    * the files whose timestamp stats intersect the query's visibility.
    */
  def compileInstant(
      spark: SparkSession, root: String, query: String, tSec: Long,
      lookbackSec: Long = 300L, subqueryStepSec: Long = 3600L,
      extrapolate: Boolean = false): DataFrame =
    PromQlCompiler.compileInstant(query,
      prunedMetrics(spark, root, query, tSec, lookbackSec, subqueryStepSec),
      tSec, lookbackSec, subqueryStepSec, extrapolate)

  /** [[compileInstant]] to the labels-map relation. */
  def compileInstantVector(
      spark: SparkSession, root: String, query: String, tSec: Long,
      lookbackSec: Long = 300L, subqueryStepSec: Long = 3600L,
      extrapolate: Boolean = false): DataFrame =
    PromQlCompiler.compileInstantVector(query,
      prunedMetrics(spark, root, query, tSec, lookbackSec, subqueryStepSec),
      tSec, lookbackSec, subqueryStepSec, extrapolate)
}
