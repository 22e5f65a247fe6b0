package graft.promql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.MaterializedView

/** INCREMENTAL recording rules — a PromQL `record` rule maintained as a
  * materialized view over a LANDED [[graft.sources.Versioned]] metric
  * table, refreshed O(delta) from the table's change feed instead of
  * re-evaluated over the whole corpus each interval.
  *
  * [[PromQlRules.evaluate]] is the batch rule loop: every evaluation
  * recomputes the rule over the full stream — correct, but O(corpus)
  * per interval. For the rules production fleets actually precompute —
  * per-window aggregations of raw samples — the work a new scrape batch
  * induces is confined to the (series, window) groups the batch touches,
  * which is exactly the [[MaterializedView]] maintenance model. This
  * module lowers the incrementalizable rule subset onto it:
  *
  * {{{
  * name = sum_over_time(metric{matchers}[R])      // also min/max/count/avg
  * name = sum by (l1, l2) (sum_over_time(metric{matchers}[R]))
  *                                                // also sum by/count_over_
  *                                                // time (the flat sample
  *                                                // count), min by/min,
  *                                                // max by/max
  * }}}
  *
  * The lowering: `win_start = timestamp − timestamp % R` and the
  * rendered series key (or the by-labels' values) become COMPUTED view
  * columns (deterministic row functions — the projection-pushes-
  * through-Δ rule), the matchers become the view's WHERE (each the
  * compiler's own predicate spelling: equality against the
  * empty-string-coalesced label value, regexes fully anchored), and the
  * aggregate maps onto the view's native lanes — sum/avg to the exact
  * decimal sum + count, count to the count, min/max to the maintained
  * extremes with their hybrid delete-recompute arm. The outer-`by` form
  * is sound because each raw sample belongs to exactly one series:
  * `sum by (ls) (sum_over_time(x[R]))` == one flat sum of samples
  * grouped by (ls, window) — the same exact-decimal total the compiler's
  * two-level spelling produces (dually min/max, and `sum by` of
  * `count_over_time` is the flat sample count). `avg by` of per-series
  * avgs is NOT a flat average and `count by` counts SERIES, not
  * samples — both refused.
  *
  * Everything else — `increase` (a lag over series order, not a group
  * aggregate), subqueries, offsets/`@` pins, binary operators — refuses
  * loudly with the supported grammar in the message; the batch loop
  * remains the general path.
  *
  * Value contract: the landed samples must be finite (the view's exact
  * decimal lanes, like every Versioned numeric column, carry no
  * NaN/±Inf — the IeeeLanes machinery guards the STREAM operators;
  * a landing pipeline drops or flags non-finite samples before commit).
  *
  * Scale shape: create is the one O(table) pass; each refresh reads
  * only the change span, point-reads only the bloom-hit view files, and
  * commits O(affected groups) — at 100 TB of landed samples a scrape
  * batch's refresh touches the batch, not the corpus. A source compact
  * degenerates to a watermark-only metadata commit (the view's no-touch
  * lemma).
  */
object PromQlRecord {

  private val overTimeFns =
    Set("sum_over_time", "min_over_time", "max_over_time",
      "count_over_time", "avg_over_time")

  // (outer aggregation op, inner *_over_time) pairs that compose FLATLY
  // over raw samples: sum-of-sums, sum-of-counts (the flat sample
  // count), min-of-mins, max-of-maxes. Deliberately absent:
  // avg (avg-of-avgs ≠ flat avg) and count (counts SERIES, not samples
  // — `count by (u) (count_over_time(x[R]))` is the series count,
  // which no flat sample aggregation expresses)
  private val byCompatible = Set(
    ("sum", "sum_over_time"), ("sum", "count_over_time"),
    ("min", "min_over_time"), ("max", "max_over_time"))

  /** Spark SQL string literal of `s` (quotes doubled, backslashes
    * escaped — the parser's default escaped-literal mode).
    */
  private def sqlStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  /** The compiler's `labelVal` in SQL text: absent labels read as "". */
  private def labelValSql(label: String): String =
    s"coalesce(try_element_at(labels, ${sqlStr(label)}), '')"

  /** [[graft.operators.Firehose.seriesKey]] in SQL text — the identical
    * sorted `k=v` rendering, as a deterministic computed column.
    */
  private val seriesKeySql: String =
    "array_join(transform(array_sort(map_entries(labels)), " +
      "e -> concat(e.key, '=', e.value)), ',')"

  private def matcherSql(m: LabelMatcher): String = {
    // the compiler's labelVal special case: __name__ reads the metric
    // name column, not the label map
    val v = if (m.label == "__name__") "name" else labelValSql(m.label)
    def anchored = sqlStr("^(?:" + m.value + ")$")
    m.op match {
      case MatchOp.Eq => s"$v = ${sqlStr(m.value)}"
      case MatchOp.Neq => s"$v != ${sqlStr(m.value)}"
      case MatchOp.Re => s"$v rlike $anchored"
      case MatchOp.NotRe => s"not ($v rlike $anchored)"
    }
  }

  private def err(msg: String): Nothing = throw PromQlCompileException(
    msg + " — incremental recording supports " +
      "`agg_over_time(metric{matchers}[R])` for agg in " +
      "sum/min/max/count/avg, and the flat compositions " +
      "`sum by (ls) (sum_over_time|count_over_time)`, " +
      "`min by (ls) (min_over_time)`, `max by (ls) (max_over_time)`; " +
      "use the batch rule loop (PromQlRules.evaluate) for everything else")

  private case class Lowered(
      ruleName: String,
      fn: String,
      rangeSec: Long,
      byLabels: Option[Seq[String]],
      where: String,
      exprCols: Seq[(String, String)],
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String])

  private def lower(ruleLine: String): Lowered = {
    val rule = PromQlRules.parse(ruleLine) match {
      case Seq(r: PromQlRules.Rule) => r
      case _ => err("expected exactly one `name = expr` recording rule")
    }
    val (fn, sel, rangeSec, byLabels) = PromQlParser.parse(rule.expr) match {
      case Call(f, Seq(RangeSelector(s, r))) if overTimeFns(f) =>
        (f, s, r, None)
      case Agg(op, Call(f, Seq(RangeSelector(s, r))), None, AggGroup.By(ls))
          if byCompatible((op, f)) =>
        (f, s, r, Some(ls))
      case Agg(op, _, _, _) if op == "avg" =>
        err("avg by (…) of per-series averages is not a flat average")
      case _ => err(s"rule '${rule.name}' is not incrementalizable")
    }
    if (sel.name.isEmpty && sel.matchers.isEmpty)
      err("the selector needs a metric name or at least one matcher")
    if (sel.offsetSec != 0 || sel.atSec.nonEmpty)
      err("offset/@ modifiers don't lower")
    val where = (sel.name.map(n => s"name = ${sqlStr(n)}").toSeq ++
      sel.matchers.map(matcherSql)).mkString(" AND ")
    val winSql = s"timestamp - timestamp % $rangeSec"
    val (exprCols, groupCols) = byLabels match {
      case None =>
        // `name` stays in the group key: a nameless or __name__-regex
        // selector spans several metrics, and the compiler's per-series
        // identity is (name, series) — read() renames to the rule name
        // AFTER grouping, exactly like the batch loop's recorded-series
        // rename (which also keeps the underlying rows distinct)
        (Seq("series" -> seriesKeySql, "win_start" -> winSql),
          Seq("component", "name", "series", "win_start"))
      case Some(ls) =>
        val sorted = ls.sorted
        (sorted.map(l => s"_lbl_$l" -> s"try_element_at(labels, ${sqlStr(l)})") :+
          ("win_start" -> winSql),
          "component" +: sorted.map(l => s"_lbl_$l") :+ "win_start")
    }
    val (sumCols, minMaxCols) = fn match {
      case "sum_over_time" | "avg_over_time" => (Seq("value"), Nil)
      case "min_over_time" | "max_over_time" => (Nil, Seq("value"))
      case "count_over_time" => (Nil, Nil)
    }
    Lowered(rule.name, fn, rangeSec, byLabels.map(_.sorted), where,
      exprCols, groupCols, sumCols, minMaxCols)
  }

  /** Lower `ruleLine` (one `name = expr` recording rule) onto a
    * materialized view at `viewRoot` over the landed metric table at
    * `sourceRoot` (columns `component, name, labels, timestamp, id,
    * value`; timestamps epoch seconds). One O(table) pass; returns the
    * view's committed version. Refusal (with the supported grammar) for
    * non-incrementalizable rules.
    */
  def create(
      spark: SparkSession,
      ruleLine: String,
      sourceRoot: String,
      viewRoot: String): Long = {
    val lo = lower(ruleLine)
    MaterializedView.create(
      spark, sourceRoot, viewRoot, lo.groupCols, lo.sumCols,
      minMaxCols = lo.minMaxCols, where = lo.where, exprCols = lo.exprCols,
      extraProps = Map(
        "rule.name" -> lo.ruleName,
        "rule.fn" -> lo.fn,
        "rule.by" -> lo.byLabels.map(_.mkString(",")).getOrElse("")))
  }

  /** Advance the recorded series to the source's latest version —
    * O(delta) via the change feed ([[MaterializedView.refresh]]).
    */
  def refresh(spark: SparkSession, viewRoot: String): Long =
    MaterializedView.refresh(spark, viewRoot)

  /** The recorded series, rendered like every rule output:
    * `(component, name = rule name, series, win_start, value)`.
    */
  def read(spark: SparkSession, viewRoot: String): DataFrame = {
    val p = graft.sources.Versioned.markerProps(
      viewRoot, graft.sources.Versioned.latestVersion(viewRoot))
    require(p.contains("rule.name") && p.contains("rule.fn"),
      s"$viewRoot is not an incremental recording rule " +
        "(no rule.* props on its latest marker)")
    val ruleName = p("rule.name")
    val fn = p("rule.fn")
    val by = p.getOrElse("rule.by", "").split(',').toSeq.filter(_.nonEmpty)
    val v = MaterializedView.read(spark, viewRoot)
    val value = (fn match {
      case "sum_over_time" => col("sum_value")
      case "avg_over_time" => col("avg_value")
      case "count_over_time" => col("cnt")
      case "min_over_time" => col("min_value")
      case "max_over_time" => col("max_value")
    }).cast("double")
    val series =
      if (by.isEmpty) col("series")
      else
        // absent by-labels drop from the output labelset, per PromQL;
        // label names pre-sorted, so the rendering is the canonical
        // series key
        array_join(
          filter(
            array(by.map(l =>
              when(col(s"_lbl_$l").isNotNull,
                concat(lit(l + "="), col(s"_lbl_$l")))): _*),
            x => x.isNotNull),
          ",")
    v.select(
      col("component"), lit(ruleName).as("name"), series.as("series"),
      col("win_start"), value.as("value"))
  }
}
