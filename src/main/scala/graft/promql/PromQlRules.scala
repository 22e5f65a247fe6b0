package graft.promql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Firehose

/** Recording rules — the evaluation loop a Prometheus server runs over a
  * rule file: each rule names an expression, the result is REGISTERED as
  * a new metric, and later rules (or dashboards) select it by name —
  * precomputation chains like `job:err_rate:1h` feeding
  * `job:err_rate:topk`. Rule text, one rule per line:
  *
  * {{{
  * # comments and blank lines are skipped
  * app:view:increase1h = sum by (user) (increase(view_total[1h]))
  * app:view:top = topk(3, app:view:increase1h)
  * }}}
  *
  * Evaluation is file-order: every rule compiles against the metric
  * UNIVERSE seen so far (the input stream plus all earlier rule
  * outputs), so chains cannot reference forward. A rule's output joins
  * the universe as ordinary samples — `(component, name = rule name,
  * labels, timestamp = win_start, id = "", value)` — which is exactly
  * how a recorded series lands in a real TSDB, and means EVERY compiler
  * construct (matchers, range functions over the step grid, binary ops,
  * `@` pins) works on recorded series with no special cases. Rule names
  * follow the metric-name grammar with interior colons (the lexer
  * already tokenizes them).
  *
  * Scale shape: pure plan composition — no rule materializes unless the
  * caller lands it ([[samples]] is the landing-ready union; in
  * production each evaluation interval appends it via
  * `Versioned.appendCommit`, making the rule loop an O(delta) ingest).
  */
object PromQlRules {

  final case class Rule(name: String, expr: String)

  private val NameRe = "[A-Za-z_:][A-Za-z0-9_:]*".r

  /** Parse rule text: `name = expr` lines, `#` comments, blanks skipped.
    * Duplicate names and malformed lines are refused loudly.
    */
  def parse(text: String): Seq[Rule] = {
    val rules = text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf('=')
        if (i <= 0) throw PromQlCompileException(s"malformed rule line: '$l'")
        val name = l.take(i).trim
        if (!NameRe.pattern.matcher(name).matches())
          throw PromQlCompileException(s"invalid rule name: '$name'")
        Rule(name, l.drop(i + 1).trim)
      }
      .toSeq
    val dup = rules.groupBy(_.name).collect { case (n, rs) if rs.size > 1 => n }
    if (dup.nonEmpty)
      throw PromQlCompileException(s"duplicate rule name(s): ${dup.mkString(", ")}")
    rules
  }

  /** Evaluate every rule in file order; returns rule name → its rendered
    * relation `(component, name, series, win_start, value)` with `name`
    * the RULE's name (it is a recorded metric now).
    */
  def evaluate(
      rulesText: String,
      metrics: DataFrame,
      stepSec: Long = 3600L,
      sliding: Boolean = false): Map[String, DataFrame] = {
    val rules = parse(rulesText)
    var universe =
      (if (metrics.columns.contains("labels")) metrics else Firehose.tagFilter(metrics))
        .select(col("component"), col("name"), col("labels"),
          col("timestamp"), col("id"), col("value"))
    val out = Map.newBuilder[String, DataFrame]
    rules.foreach { r =>
      val vec =
        if (sliding) PromQlCompiler.compileSlidingVector(r.expr, universe, stepSec)
        else PromQlCompiler.compileVector(r.expr, universe, stepSec)
      // the recorded series: rule name, window start as sample time
      val recorded = vec.select(
        col("component"), lit(r.name).as("name"), col("labels"),
        col("win_start").as("timestamp"), lit("").as("id"), col("value"))
      universe = universe.unionByName(recorded)
      out += r.name -> recorded.select(
        col("component"), col("name"),
        Firehose.seriesKey(col("labels")).as("series"),
        col("timestamp").as("win_start"), col("value"))
    }
    out.result()
  }

  /** All rule outputs as ONE landing-ready sample relation — what a
    * production loop appends to the recorded-series table each interval.
    */
  def samples(
      rulesText: String,
      metrics: DataFrame,
      stepSec: Long = 3600L,
      sliding: Boolean = false): DataFrame =
    evaluate(rulesText, metrics, stepSec, sliding).values
      .map(_.select(col("component"), col("name"), col("series"),
        col("win_start"), col("value")))
      .reduce(_ unionByName _)
}
