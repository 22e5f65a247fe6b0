package graft.promql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Firehose
import graft.streaming.FirehoseStream

/** PromQL text → STREAMING plan: the alert rules a Prometheus user writes,
  * dispatched onto the verified [[FirehoseStream]] operators so they run
  * continuously on the live stream instead of per batch. This is the
  * third leg of the no-drift triangle: the batch compiler lowers text
  * onto the batch operators, the streaming operators are spec-pinned
  * batch-identical on closed windows, and this front-end lowers the SAME
  * text onto those streaming operators — so a rule evaluated offline and
  * the same rule running live cannot diverge.
  *
  * == Scope ==
  *
  * Streaming evaluation is an OPERATOR SUBSET, not the full expression
  * algebra (the batch compiler's nested expressions need arbitrary
  * recombination of relations; a streaming plan is constrained by output
  * modes and stateful-operator chaining). Supported shapes, each lowering
  * to exactly one verified operator over the matcher-filtered stream:
  *
  *   - `metric{matchers}` → [[FirehoseStream.gaugeLatest]] (running
  *     latest per series, registry TTL semantics)
  *   - `increase(x[R])` / `rate(x[R])` → [[FirehoseStream.counterIncrease]]
  *     (running windowed increase; rate divides by R)
  *   - `*_over_time(x[R])` (avg/sum/min/max/count/last/stddev/stdvar/
  *     present) → [[FirehoseStream.overTimeAgg]]
  *   - `quantile_over_time(q, x[R])` → [[FirehoseStream.quantileOverTime]]
  *     (mergeable sketch — approximate where batch is exact, the one
  *     documented divergence)
  *   - `delta/idelta/irate(x[R])` → [[FirehoseStream.irateDelta]]
  *   - `holt_winters(x[R], sf, tf)` → [[FirehoseStream.holtWinters]]
  *   - `sum/min/max/avg/count/quantile(metric)` (no grouping) →
  *     [[FirehoseStream.instantAgg]] over `stepSec` windows
  *   - `count_values("label", metric)` → [[FirehoseStream.countValues]]
  *   - `selL op selR` (arithmetic/comparison, `on`/`ignoring`) →
  *     [[FirehoseStream.vectorMatch]] over `stepSec` windows
  *   - `selL and/or/unless selR` → [[FirehoseStream.vectorSetOp]]
  *   - `agg_over_time(rate(x[R])[Router:R])` (min/max/avg) →
  *     [[FirehoseStream.subqueryOverTimeClosed]]
  *   - `histogram_quantile/count/sum/avg/stddev/stdvar/fraction` over a
  *     range → [[FirehoseStream.nativeHistogramClosed]] + the batch
  *     [[graft.operators.NativeHist]] kernels (round 11 — the native-
  *     histogram family streams with occupied-bucket-bounded state)
  *
  * Anything else — nested function composition, `group_left/right`,
  * `offset`, `on()` with an empty list, scalar-vector arithmetic —
  * raises a [[PromQlCompileException]] naming the batch compiler as the
  * fallback: loud, never silently wrong.
  *
  * Single-valued shapes emit `(component, name, series, win_start,
  * value)` (win_start a timestamp for window-native operators, epoch
  * seconds for the flatMapGroupsWithState family — each operator's native
  * clock); multi-valued shapes (`gaugeLatest`, `instantAgg`,
  * `count_values`) emit their operator's native relation.
  */
object PromQlStream {

  def compile(
      query: String,
      metrics: DataFrame,
      stepSec: Long = 3600L,
      watermarkDelay: String = "10 minutes"): DataFrame =
    lower(PromQlParser.parse(query), metrics, stepSec, watermarkDelay)

  private def err(msg: String): Nothing = throw PromQlCompileException(msg)

  private def anchored(re: String): String = "^(?:" + re + ")$"

  /** Matcher-filtered raw stream: the selector's predicate evaluated on
    * the same post-tagFilter label semantics the batch compiler uses,
    * then the labels column dropped so each streaming operator's own
    * prep runs on the raw schema unchanged.
    */
  private def filtered(metrics: DataFrame, sel: VectorSelector): DataFrame = {
    if (sel.offsetSec != 0) err("offset is not supported in the streaming compile")
    if (sel.atSec.isDefined) err("@ is not supported in the streaming compile")
    val labeled = Firehose.tagFilter(metrics)
    def labelVal(m: LabelMatcher): Column =
      if (m.label == "__name__") col("name")
      else coalesce(try_element_at(col("labels"), lit(m.label)), lit(""))
    def pred(m: LabelMatcher): Column = m.op match {
      case MatchOp.Eq => labelVal(m) === lit(m.value)
      case MatchOp.Neq => labelVal(m) =!= lit(m.value)
      case MatchOp.Re => labelVal(m).rlike(anchored(m.value))
      case MatchOp.NotRe => !labelVal(m).rlike(anchored(m.value))
    }
    val named = sel.name match {
      case Some(n) => labeled.filter(col("name") === lit(n))
      case None =>
        if (sel.matchers.isEmpty) err("selector needs a name or at least one matcher")
        labeled
    }
    sel.matchers.foldLeft(named)((df, m) => df.filter(pred(m))).drop("labels")
  }

  private def width(r: Long): String = s"$r seconds"

  private val overTimeCols = Map(
    "avg_over_time" -> "avg_value", "sum_over_time" -> "sum_value",
    "min_over_time" -> "min_value", "max_over_time" -> "max_value",
    "count_over_time" -> "n_samples", "last_over_time" -> "last_value",
    "stddev_over_time" -> "stddev_value", "stdvar_over_time" -> "stdvar_value")

  private val instantCols = Map(
    "sum" -> "sum_value", "min" -> "min_value", "max" -> "max_value",
    "avg" -> "avg_value", "count" -> "n_series", "quantile" -> "q_value")

  private def scalarLit(e: PromExpr, what: String): Double = e match {
    case NumberLit(v) => v
    case Neg(NumberLit(v)) => -v
    case _ => err(s"$what must be a number literal in the streaming compile")
  }

  private def rangeArg(fn: String, e: PromExpr): (VectorSelector, Long) = e match {
    case RangeSelector(sel, r) => (sel, r)
    case _ => err(s"$fn expects a plain range selector (x[5m]) in the streaming compile")
  }

  /** The output window grid of a CHAINABLE lowering — the shapes whose
    * streaming plan is a window-native aggregation (emitting closed
    * windows with `window.start` as the event-time column, so a second
    * stateful operator can legally follow), through any scalar-threshold
    * wrappers. None for everything else (the TWS/flatMapGroupsWithState
    * family projects its event time away — nothing to chain on).
    */
  private def windowGrid(e: PromExpr): Option[Long] = e match {
    case Call(fn, Seq(RangeSelector(_, r)))
        if overTimeCols.contains(fn) || fn == "present_over_time" ||
          fn == "delta" || fn == "idelta" || fn == "irate" ||
          fn == "histogram_count" || fn == "histogram_sum" ||
          fn == "histogram_avg" || fn == "histogram_stddev" ||
          fn == "histogram_stdvar" => Some(r)
    case Call("quantile_over_time", Seq(_, RangeSelector(_, r))) => Some(r)
    case Call("histogram_quantile", Seq(_, RangeSelector(_, r))) => Some(r)
    case Call("histogram_fraction", Seq(_, _, RangeSelector(_, r))) => Some(r)
    case Call("holt_winters", Seq(RangeSelector(_, r), _, _)) => Some(r)
    // rate/increase chain too (round 14): the for-path lowers them onto
    // the CLOSED-window increase (append mode, event-time-tagged output
    // — the eventTimeColumnName chaining contract), not the Update-mode
    // operator the plain lowering uses
    case Call(fn, Seq(RangeSelector(_, r)))
        if fn == "increase" || fn == "rate" => Some(r)
    // the closed rate SUBQUERY chains too (round 15, the last streaming
    // `for` gap): its outer windows tumble on the subquery's own range
    // grid — the same grid the batch rule evaluator checks `for` against
    case Call(fn, Seq(Subquery(Call("rate", Seq(RangeSelector(_, inner))),
        outer, step)))
        if (fn == "min_over_time" || fn == "max_over_time" ||
          fn == "avg_over_time") && step.forall(_ == inner) => Some(outer)
    case Binary(op, l, NumberLit(_), _, _) if !setOps(op) => windowGrid(l)
    case Binary(op, NumberLit(_), r, _, _) if !setOps(op) => windowGrid(r)
    case _ => None
  }

  /** The for-path's lowering: rate/increase route onto the CLOSED
    * append-mode increase (each window's FINAL total, event-time-tagged
    * for the chained streak — the Update-mode running totals would both
    * re-fire per update and refuse to chain); everything else lowers
    * normally. Scalar wrappers recurse so `rate(x[1h]) * 60 > c for d`
    * stays on the closed relation.
    */
  private def lowerForStreak(
      ast: PromExpr, metrics: DataFrame, stepSec: Long, wm: String): DataFrame =
    ast match {
      case Call(fn @ ("increase" | "rate"), Seq(RangeSelector(sel, r))) =>
        val closed = graft.streaming.FirehoseTws
          .counterIncreaseClosed(filtered(metrics, sel), r, wm).toDF()
        if (fn == "increase") closed
        else closed.withColumn("value", col("value") / lit(r.toDouble))
      // the closed rate subquery (round 15): the subquery processor's
      // per-outer-window aggregate emitted as the chainable append-mode
      // grid (event-time-tagged), so the streak follows unchanged
      case Call(fn @ ("min_over_time" | "max_over_time" | "avg_over_time"),
          Seq(Subquery(Call("rate", Seq(RangeSelector(sel, inner))),
            outer, step)))
          if step.forall(_ == inner) =>
        val field = fn match {
          case "min_over_time" => "min_rate"
          case "max_over_time" => "max_rate"
          case "avg_over_time" => "avg_rate"
        }
        graft.streaming.FirehoseTws
          .subqueryOverTimeChained(filtered(metrics, sel), inner, outer,
            field, wm)
          .toDF()
      case Binary(op, l, NumberLit(s), _, boolMod) if !setOps(op) =>
        applyScalar(lowerForStreak(l, metrics, stepSec, wm), s, op,
          vecOnLeft = true, boolMod)
      case Binary(op, NumberLit(s), r, _, boolMod) if !setOps(op) =>
        applyScalar(lowerForStreak(r, metrics, stepSec, wm), s, op,
          vecOnLeft = false, boolMod)
      case other => lower(other, metrics, stepSec, wm)
    }

  /** The streaming native-histogram lowering shared by the
    * `histogram_*` family: the range's observations build the sparse
    * exponential histogram per closed window
    * ([[graft.streaming.FirehoseStream.nativeHistogramClosed]] — state
    * bounded by occupied buckets via the chained bucket-count
    * aggregation), then the BATCH kernels apply unchanged (quantile /
    * accessors / spread / fraction are row-local folds over the sorted
    * bucket array — stateless projections, legal after the streaming
    * aggregation). The m37 derivation model, the same one the batch
    * text compiler uses — text, batch, and stream cannot drift.
    */
  private def nativeHist(
      fn: String, arg: PromExpr, metrics: DataFrame, wm: String): DataFrame = {
    val (sel, r) = rangeArg(fn, arg)
    FirehoseStream.nativeHistogramClosed(
        filtered(metrics, sel), schema = 0, width = s"$r seconds",
        watermarkDelay = wm)
      .withColumn("series", lit(""))
  }

  private def single(df: DataFrame, valueCol: Column): DataFrame =
    df.select(col("component"), col("name"), col("series"), col("win_start"),
      valueCol.cast("double").as("value"))

  private val setOps = Set("and", "or", "unless")
  private val comparisons = Set("==", "!=", "<", ">", "<=", ">=")

  private def applyScalar(
      base: DataFrame, s: Double, op: String,
      vecOnLeft: Boolean, boolMod: Boolean): DataFrame = {
    def ap(f: (Column, Column) => Column): Column =
      if (vecOnLeft) f(col("value"), lit(s)) else f(lit(s), col("value"))
    if (comparisons(op)) {
      if (boolMod) base.withColumn("value", ap(PromQlCompiler.cmpPred(op, _, _)).cast("double"))
      else base.filter(ap(PromQlCompiler.cmpPred(op, _, _)))
    } else base.withColumn("value", ap(PromQlCompiler.arith(op, _, _)).cast("double"))
  }

  /** A single `alert name = expr` line running CONTINUOUSLY: the
    * expression lowers to its streaming shape (single-valued, window-
    * closed — the threshold comparison is the usual guard) and every
    * breach window emits an alert sample `(component, name = alert name,
    * series, win_start, value)` as it closes.
    *
    * `for d` durations stream two ways (round 14 closes the last
    * documented semantic gap):
    *
    *  - the SELECTOR-THRESHOLD shape (round 11): `increase(sel[W]) > c
    *    for d` / `rate(sel[W]) > c for d` with `d` a multiple of `W`
    *    lowers onto the m22 [[graft.streaming.FirehoseTws
    *    .forDurationAlert]] operator — one stateful operator at the
    *    raw-sample level, rate thresholds rescaled to per-window
    *    increases (`c·W`).
    *  - the GENERAL windowed shape (round 14): any WINDOW-NATIVE
    *    lowering (the `*_over_time` family, `quantile_over_time`,
    *    `delta`/`idelta`/`irate`/`holt_winters`, the native-histogram
    *    family — each a windowed aggregation emitting
    *    on close — plus scalar-threshold wrappers over them) chains the
    *    [[graft.streaming.FirehoseTws.ForStreakProcessor]] AFTER the
    *    expression's own aggregation: `k = d/W + 1` consecutive
    *    breaching CLOSED windows before the first fire, consecutiveness
    *    broken by window spacing (a non-breaching window produces no
    *    row — the batch evaluator's `lag(k-1)` presence streak,
    *    spec-pinned batch-identical on closed windows). The chain works
    *    because those relations keep `window.start` as their event-time
    *    column — no watermark is re-declared mid-stream (the verified
    *    stall), Spark's append-mode multi-stateful support does the
    *    rest.
    *
    * rate/increase under NON-threshold wrappers chain too (round 14,
    * second leg): the for-path lowers them onto
    * [[graft.streaming.FirehoseTws.counterIncreaseClosed]] — each
    * (series, window) FINAL total emitted exactly once in append mode
    * with a declared `event_time` column (Spark 4's
    * `eventTimeColumnName` transformWithState overload; the tag is
    * max(window end, watermark + 1 ms) because the chaining contract
    * forbids emitting behind the watermark, and a window closes exactly
    * BECAUSE the watermark passed it) — so the streak, a second
    * transformWithState, legally follows.
    *
    * `keep_firing_for` STREAMS too (round 14, third leg): the
    * [[graft.streaming.FirehoseTws.KeepStreakCore]] fold — firing dies
    * at the first decided-false point more than keep past the last
    * breach, keep-TAIL rows carry the preceding breach's value and emit
    * as the watermark decides each grid point (an event-time timer
    * re-arms at the next tail's decision time, so a quiet series keeps
    * its tail flowing) — property-pinned against the same sequential
    * reference machine as the batch evaluator, and batch-parity-pinned
    * end-to-end.
    *
    * The closed rate SUBQUERY chains too (round 15, closing the last
    * streaming `for` gap): `agg_over_time(rate(x[inner])[outer:inner])
    * > c for d` lowers the subquery processor onto
    * [[graft.streaming.FirehoseTws.subqueryOverTimeChained]] — the same
    * exactly-once closed fold, emitted in append mode with the
    * event-time tag — and the streak (and `keep_firing_for`'s keep
    * machine) follows unchanged on the subquery's outer-range grid, the
    * grid the batch rule evaluator checks `for` against.
    *
    * Still refused loudly: `for` over shapes with no chainable window
    * grid (gaugeLatest, instant aggregations, vector matches); the
    * batch rule evaluator ([[PromQlRules.evaluate]]) over a landed
    * stream covers those.
    */
  def compileAlert(
      line: String,
      metrics: DataFrame,
      stepSec: Long = 3600L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val alert = PromQlRules.parse(line) match {
      case Seq(a: PromQlRules.Alert) => a
      case _ => err("compileAlert takes exactly one `alert name = expr` line")
    }
    if (alert.forSec != 0 || alert.keepFiringForSec != 0)
      return PromQlParser.parse(alert.expr) match {
        case Binary(">", Call(fn @ ("increase" | "rate"),
            Seq(RangeSelector(sel, r))), NumberLit(c), _, false)
            if alert.keepFiringForSec == 0 =>
          if (alert.forSec % r != 0)
            err(s"alert '${alert.name}': for ${alert.forSec}s must be a " +
              s"multiple of the ${r}s range")
          val k = (alert.forSec / r).toInt + 1
          val minInc = if (fn == "increase") c else c * r
          graft.streaming.FirehoseTws.forDurationAlert(
              filtered(metrics, sel), r, minInc, k, watermarkDelay).toDF()
            .select(col("component"), lit(alert.name).as("name"),
              col("series"), col("fire_win").as("win_start"),
              col("increase").as("value"))
        case ast =>
          windowGrid(ast) match {
            case Some(grid) =>
              if (alert.forSec % grid != 0)
                err(s"alert '${alert.name}': for ${alert.forSec}s must be " +
                  s"a multiple of the expression's ${grid}s window")
              if (alert.keepFiringForSec % grid != 0)
                err(s"alert '${alert.name}': keep_firing_for " +
                  s"${alert.keepFiringForSec}s must be a multiple of the " +
                  s"expression's ${grid}s window")
              val k = (alert.forSec / grid).toInt + 1
              val breaches = lowerForStreak(ast, metrics, stepSec, watermarkDelay)
              if (!breaches.columns.contains("value") ||
                  !breaches.columns.contains("win_start") ||
                  !breaches.columns.contains("series"))
                err(s"alert '${alert.name}': `for` needs a single-valued " +
                  "windowed per-series shape")
              val fired =
                // keep_firing_for takes the timer-driven keep streak;
                // the closed-increase chain carries its event-time TAG
                // column, window-native relations carry win_start itself
                if (alert.keepFiringForSec != 0)
                  graft.streaming.FirehoseTws.forStreakKeep(
                    breaches, grid, k, alert.keepFiringForSec)
                else if (breaches.columns.contains("event_time"))
                  graft.streaming.FirehoseTws.forStreakChained(breaches, grid, k)
                else graft.streaming.FirehoseTws.forStreak(breaches, grid, k)
              fired.toDF()
                .select(col("component"), lit(alert.name).as("name"),
                  col("series"), col("fire_win").as("win_start"),
                  col("increase").as("value"))
            case None =>
              err(s"alert '${alert.name}': `for` durations stream for " +
                "window-native shapes (*_over_time, quantile_over_time, " +
                "delta/idelta/irate/holt_winters, histogram_*, with " +
                "optional scalar thresholds) and the increase/rate " +
                "selector-threshold shape; use the batch rule evaluator " +
                "for the rest")
          }
      }
    val breaches = lower(PromQlParser.parse(alert.expr), metrics, stepSec, watermarkDelay)
    if (!breaches.columns.contains("value") || !breaches.columns.contains("win_start"))
      err("alert expressions must lower to a single-valued windowed shape")
    breaches.select(col("component"), lit(alert.name).as("name"),
      col("series"), col("win_start"), col("value"))
  }

  private def lower(
      ast: PromExpr,
      metrics: DataFrame,
      stepSec: Long,
      wm: String): DataFrame = ast match {

    case sel: VectorSelector =>
      FirehoseStream.gaugeLatest(filtered(metrics, sel), wm).toDF()

    case Call(fn @ ("increase" | "rate"), Seq(arg)) =>
      val (sel, r) = rangeArg(fn, arg)
      val inc = FirehoseStream.counterIncrease(filtered(metrics, sel), r, wm).toDF()
      if (fn == "increase") single(inc, col("increase"))
      else single(inc, col("increase") / lit(r.toDouble))

    case Call(fn, Seq(arg)) if overTimeCols.contains(fn) =>
      val (sel, r) = rangeArg(fn, arg)
      single(
        FirehoseStream.overTimeAgg(filtered(metrics, sel), width(r), wm),
        col(overTimeCols(fn)))

    case Call("histogram_quantile", Seq(qe, arg)) =>
      val q = scalarLit(qe, "histogram_quantile quantile")
      single(graft.operators.NativeHist.quantile(
        nativeHist("histogram_quantile", arg, metrics, wm), q), col("q_value"))
    case Call(fn @ ("histogram_count" | "histogram_sum" | "histogram_avg"), Seq(arg)) =>
      single(graft.operators.NativeHist.accessors(nativeHist(fn, arg, metrics, wm)),
        col("h_" + fn.stripPrefix("histogram_")))
    case Call(fn @ ("histogram_stddev" | "histogram_stdvar"), Seq(arg)) =>
      single(graft.operators.NativeHist.spread(nativeHist(fn, arg, metrics, wm)),
        col("h_" + fn.stripPrefix("histogram_")))
    case Call("histogram_fraction", Seq(loE, hiE, arg)) =>
      val lo = scalarLit(loE, "histogram_fraction lower")
      val hi = scalarLit(hiE, "histogram_fraction upper")
      single(graft.operators.NativeHist.fraction(
        nativeHist("histogram_fraction", arg, metrics, wm), lo, hi), col("fraction"))

    case Call("present_over_time", Seq(arg)) =>
      val (sel, r) = rangeArg("present_over_time", arg)
      single(
        FirehoseStream.overTimeAgg(filtered(metrics, sel), width(r), wm),
        lit(1.0))

    case Call("quantile_over_time", Seq(qe, arg)) =>
      val q = scalarLit(qe, "quantile_over_time quantile")
      val (sel, r) = rangeArg("quantile_over_time", arg)
      single(
        FirehoseStream.quantileOverTime(
          filtered(metrics, sel), q, width(r), watermarkDelay = wm),
        col("q_value"))

    case Call(fn @ ("delta" | "idelta" | "irate"), Seq(arg)) =>
      val (sel, r) = rangeArg(fn, arg)
      single(
        FirehoseStream.irateDelta(filtered(metrics, sel), width(r), wm),
        col(fn))
        .filter(col("value").isNotNull)

    case Call("holt_winters", Seq(arg, sfE, tfE)) =>
      val sf = scalarLit(sfE, "holt_winters smoothing factor")
      val tf = scalarLit(tfE, "holt_winters trend factor")
      if (sf <= 0 || sf >= 1) err("holt_winters smoothing factor must be in (0, 1)")
      if (tf <= 0 || tf > 1) err("holt_winters trend factor must be in (0, 1]")
      val (sel, r) = rangeArg("holt_winters", arg)
      single(
        FirehoseStream.holtWinters(filtered(metrics, sel), sf, tf, width(r), wm),
        col("smoothed"))
        .filter(col("value").isNotNull)

    // min/max/avg over a closed rate subquery — the one nested shape the
    // streaming engine evaluates (its own stateful operator)
    case Call(fn @ ("min_over_time" | "max_over_time" | "avg_over_time"),
        Seq(Subquery(Call("rate", Seq(RangeSelector(sel, inner))), outer, step)))
        if step.forall(_ == inner) =>
      val c = fn match {
        case "min_over_time" => "min_rate"
        case "max_over_time" => "max_rate"
        case "avg_over_time" => "avg_rate"
      }
      FirehoseStream
        .subqueryOverTimeClosed(filtered(metrics, sel), inner, outer, wm).toDF()
        .select(col("component"), col("name"), col("series"),
          col("outer_win").as("win_start"), col(c).cast("double").as("value"))

    case Agg(op, sel: VectorSelector, param, AggGroup.All) =>
      op match {
        case "count_values" =>
          param match {
            case Some(StringLit(_)) =>
              FirehoseStream.countValues(filtered(metrics, sel), width(stepSec), wm)
            case _ => err("count_values requires a string label parameter")
          }
        case o if instantCols.contains(o) =>
          val q = if (o == "quantile")
            scalarLit(param.getOrElse(err("quantile requires a parameter")), "quantile")
          else 0.5
          FirehoseStream
            .instantAgg(filtered(metrics, sel), q, width(stepSec), wm)
            .select(col("component"), col("name"), col("win_start"),
              col(instantCols(o)).cast("double").as("value"))
        case other =>
          err(s"aggregation '$other' is not in the streaming subset " +
            "(use the batch compiler)")
      }

    // vector ⊕ scalar on any single-valued lowered shape — the alert
    // threshold form (`avg_over_time(x[1h]) > 5`): comparisons filter
    // (or 0/1 under bool), arithmetic maps, on the operator's own value
    // column, sharing the batch compiler's op semantics
    case Binary(op, l, NumberLit(s), _, boolMod) if !setOps(op) =>
      val base = lower(l, metrics, stepSec, wm)
      if (!base.columns.contains("value"))
        err("scalar arithmetic needs a single-valued streaming shape " +
          "(not gaugeLatest/count_values — compare a windowed function)")
      applyScalar(base, s, op, vecOnLeft = true, boolMod)
    case Binary(op, NumberLit(s), r, _, boolMod) if !setOps(op) =>
      val base = lower(r, metrics, stepSec, wm)
      if (!base.columns.contains("value"))
        err("scalar arithmetic needs a single-valued streaming shape " +
          "(not gaugeLatest/count_values — compare a windowed function)")
      applyScalar(base, s, op, vecOnLeft = false, boolMod)

    case b: Binary =>
      val vm = b.matching.getOrElse(VectorMatching())
      if (vm.groupLeft || vm.groupRight)
        err("group_left/group_right are not supported in the streaming compile")
      if (vm.on.exists(_.isEmpty))
        err("on() with an empty label list is not supported in the streaming compile")
      val (onLs, igLs) = vm.on match {
        case Some(ls) => (ls, Seq.empty[String])
        case None => (Seq.empty[String], vm.ignoring.getOrElse(Nil))
      }
      (b.lhs, b.rhs) match {
        case (l: VectorSelector, r: VectorSelector) if setOps(b.op) =>
          FirehoseStream.vectorSetOp(
            filtered(metrics, l), filtered(metrics, r), b.op,
            onLs, igLs, width(stepSec), wm)
        case (l: VectorSelector, r: VectorSelector) =>
          // arithmetic / comparison on the shared op semantics: bool
          // yields 0/1, bare comparison keeps the left value or drops
          val f: (Column, Column) => Column =
            if (comparisons(b.op)) {
              if (b.boolMod) (lc, rc) =>
                PromQlCompiler.cmpPred(b.op, lc, rc).cast("double")
              else (lc, rc) => when(PromQlCompiler.cmpPred(b.op, lc, rc), lc)
            } else (lc, rc) => PromQlCompiler.arith(b.op, lc, rc)
          FirehoseStream.vectorMatch(
            filtered(metrics, l), filtered(metrics, r), f,
            onLs, igLs, width(stepSec), wm)
        case _ =>
          err("streaming binary ops take plain selectors on both sides " +
            "(compose alert arithmetic from gauges; use the batch compiler " +
            "for nested expressions)")
      }

    case other =>
      err(s"'${PromQlPrinter.print(other)}' is outside the streaming subset " +
        "(supported: selectors, rate/increase, *_over_time, " +
        "quantile/delta/idelta/irate/holt_winters, ungrouped instant " +
        "aggregations, count_values, selector-vs-selector binary and set " +
        "ops, and closed rate subqueries); use PromQl.compile for batch")
  }
}
