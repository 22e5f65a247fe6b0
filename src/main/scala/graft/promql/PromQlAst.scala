package graft.promql

/** Abstract syntax for the PromQL subset the engine compiles to Spark
  * plans. The firehose reference is the INGEST half of a Prometheus
  * deployment (AbstractPrometheusFirehose.java renders gauges for a
  * Prometheus server to scrape); the query half its users actually touch
  * is PromQL text. This AST + [[PromQlParser]] + [[PromQlCompiler]] close
  * that loop engine-side: the same expressions a Prometheus user writes,
  * parsed and compiled onto the library's verified operators
  * ([[graft.operators.Firehose]]) instead of a single-node TSDB.
  *
  * Parenthesization is NOT represented: the parser strips grouping parens
  * and [[PromQlPrinter]] re-inserts exactly the parens precedence
  * requires, so `parse(print(ast)) == ast` holds structurally — the
  * round-trip property the fuzz spec pins.
  */
sealed trait PromExpr

/** Scalar literal (`5`, `0.9`, `2e3`). */
final case class NumberLit(v: Double) extends PromExpr

/** String literal — only legal as a function argument
  * (`label_replace`, `count_values`).
  */
final case class StringLit(v: String) extends PromExpr

/** One `label <op> "value"` matcher inside a selector's `{...}`. */
final case class LabelMatcher(label: String, op: MatchOp, value: String)

sealed abstract class MatchOp(val render: String)
object MatchOp {
  case object Eq extends MatchOp("=")
  case object Neq extends MatchOp("!=")
  case object Re extends MatchOp("=~")
  case object NotRe extends MatchOp("!~")
}

/** Sentinel `atSec` values for `@ start()` / `@ end()` — the evaluation
  * span's bounds, resolved lazily at compile time (no literal unix
  * second can collide: the parser caps literals at |t| < 1e15).
  */
object PromQlAst {
  val AtStart: Long = Long.MinValue
  val AtEnd: Long = Long.MaxValue
}

/** Instant vector selector: `name{matchers} offset 5m`. A selector with
  * no name and only `__name__` matchers is legal PromQL and supported.
  * `offsetSec` > 0 looks back (`offset 5m`), < 0 forward (`offset -5m`).
  */
final case class VectorSelector(
    name: Option[String],
    matchers: Seq[LabelMatcher] = Nil,
    offsetSec: Long = 0L,
    atSec: Option[Long] = None) extends PromExpr

/** Range vector selector: `sel[5m]` — only legal as a range-function
  * argument, which the compiler enforces.
  */
final case class RangeSelector(sel: VectorSelector, rangeSec: Long) extends PromExpr

/** Subquery: `expr[1h:5m]` — the inner expression evaluated every
  * `stepSec`, the resulting samples range-aggregated over `rangeSec` by
  * the enclosing `*_over_time` call. A missing step (`[1h:]`) defers to
  * the compile-time default step.
  */
final case class Subquery(expr: PromExpr, rangeSec: Long, stepSec: Option[Long]) extends PromExpr

/** Function call: `rate(x[5m])`, `clamp(v, 0, 10)`, `label_replace(...)`. */
final case class Call(fn: String, args: Seq[PromExpr]) extends PromExpr

/** Aggregation grouping clause. [[AggGroup.All]] collapses everything. */
sealed trait AggGroup
object AggGroup {
  case object All extends AggGroup
  final case class By(labels: Seq[String]) extends AggGroup
  final case class Without(labels: Seq[String]) extends AggGroup
}

/** Aggregation operator: `sum by (a) (expr)`, `topk(5, expr)`,
  * `quantile(0.9, expr)`, `count_values("v", expr)`. `param` carries the
  * leading parameter of the parameterized forms.
  */
final case class Agg(
    op: String,
    expr: PromExpr,
    param: Option[PromExpr] = None,
    grouping: AggGroup = AggGroup.All) extends PromExpr

/** `on(...)`/`ignoring(...)` + `group_left`/`group_right` modifiers of a
  * binary operation. `on=None` means match on the full label set.
  */
final case class VectorMatching(
    on: Option[Seq[String]] = None,
    ignoring: Option[Seq[String]] = None,
    groupLeft: Boolean = false,
    groupRight: Boolean = false)

/** Binary operation. `boolMod` is the `bool` modifier on comparisons. */
final case class Binary(
    op: String,
    lhs: PromExpr,
    rhs: PromExpr,
    matching: Option[VectorMatching] = None,
    boolMod: Boolean = false) extends PromExpr

/** Unary minus (`-expr`; unary `+` is dropped by the parser). */
final case class Neg(expr: PromExpr) extends PromExpr

object PromQlDurations {
  private val unitSec: Seq[(String, Long)] = Seq(
    "y" -> 31536000L, "w" -> 604800L, "d" -> 86400L,
    "h" -> 3600L, "m" -> 60L, "s" -> 1L)

  /** Render seconds as a canonical PromQL duration (`5400` → `"1h30m"`). */
  def render(sec: Long): String = {
    require(sec > 0, s"duration must be positive, got ${sec}s")
    val sb = new StringBuilder
    var rest = sec
    unitSec.foreach { case (u, s) =>
      if (rest >= s) { sb.append(rest / s).append(u); rest %= s }
    }
    sb.toString
  }

  /** Parse a PromQL duration literal (`1h30m`, `90s`, `250ms`) to whole
    * seconds. Sub-second residue is rejected — the engine's windows are
    * second-quantized like the firehose's own `window{interval}` field.
    */
  def parse(text: String): Either[String, Long] = {
    val m = java.util.regex.Pattern
      .compile("([0-9]+)(ms|y|w|d|h|m|s)")
      .matcher(text)
    var totalMs = 0L
    var consumed = 0
    while (m.find()) {
      if (m.start() != consumed) return Left(s"malformed duration '$text'")
      val n = m.group(1).toLong
      val ms = m.group(2) match {
        case "ms" => n
        case u => n * unitSec.find(_._1 == u).get._2 * 1000L
      }
      totalMs += ms
      consumed = m.end()
    }
    if (consumed != text.length || consumed == 0) Left(s"malformed duration '$text'")
    else if (totalMs == 0) Left(s"duration '$text' must be positive")
    else if (totalMs % 1000L != 0) Left(s"sub-second duration '$text' unsupported (windows are second-quantized)")
    else Right(totalMs / 1000L)
  }
}

/** Precedence-aware pretty printer — the inverse of [[PromQlParser]].
  * Emits the minimal parenthesization the grammar needs, so printing is
  * canonical and `parse(print(ast)) == ast` (fuzz-pinned).
  */
object PromQlPrinter {

  /** Binding strength, low → high, mirroring the parser's ladder. */
  private def prec(op: String): Int = op match {
    case "or" => 1
    case "and" | "unless" => 2
    case "==" | "!=" | "<" | ">" | "<=" | ">=" => 3
    case "+" | "-" => 4
    case "*" | "/" | "%" | "atan2" => 5
    case "^" => 6
  }

  def print(e: PromExpr): String = p(e, 0)

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c => c.toString
    } + "\""

  private def renderNum(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v == Double.PositiveInfinity) "Inf"
    else if (v == Double.NegativeInfinity) "-Inf"
    // -0.0 equals 0.0 under ==, but must keep its sign through a
    // print -> parse round trip (the unary fold makes NumberLit(-0.0))
    else if (v == 0.0 && 1.0 / v < 0) "-0"
    else if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** Does `s` re-lex as ONE identifier token (the lexer's rule: a
    * letter/underscore start, letter/digit/underscore/colon
    * continuation)? Non-conforming names print QUOTED — Prometheus
    * 3.x's UTF-8 name syntax — so print → parse round-trips for any
    * label text.
    */
  private def bareLabel(s: String): Boolean =
    s.nonEmpty && (s.head.isLetter || s.head == '_') &&
      s.tail.forall(c => c.isLetterOrDigit || c == '_' || c == ':')

  /** A metric name prints bare only when it also re-PARSES as a name:
    * keywords and the case-insensitive Inf/NaN number literals would
    * change meaning, so they ride the quoted `{"name"}` form.
    */
  private def bareMetric(s: String): Boolean =
    bareLabel(s) && !PromQlParser.keywords(s) &&
      !s.equalsIgnoreCase("inf") && !s.equalsIgnoreCase("nan")

  private def labelName(l: String): String =
    if (bareLabel(l)) l else quote(l)

  private def matchers(ms: Seq[LabelMatcher]): String =
    ms.map(m => s"${labelName(m.label)}${m.op.render}${quote(m.value)}")
      .mkString(",")

  /** The name + matcher-block part of a selector — shared by the
    * instant and RANGE spellings (they differ only in where offset/@
    * attach). Non-bare names ride the quoted `{"name",…}` shorthand,
    * which re-parses as a `__name__` equality matcher (semantically
    * identical).
    */
  private def selectorBase(s: VectorSelector): String = s.name match {
    case Some(n) if bareMetric(n) =>
      n + (if (s.matchers.nonEmpty) "{" + matchers(s.matchers) + "}" else "")
    case Some(n) =>
      "{" + (quote(n) +: s.matchers.map(m =>
        s"${labelName(m.label)}${m.op.render}${quote(m.value)}"))
        .mkString(",") + "}"
    case None => "{" + matchers(s.matchers) + "}"
  }

  private def selector(s: VectorSelector): String =
    selectorBase(s) + offsetSuffix(s.offsetSec) + atSuffix(s.atSec)

  private def offsetSuffix(off: Long): String =
    if (off == 0) ""
    else if (off > 0) s" offset ${PromQlDurations.render(off)}"
    else s" offset -${PromQlDurations.render(-off)}"

  private def atSuffix(at: Option[Long]): String =
    at.map {
      case PromQlAst.AtStart => " @ start()"
      case PromQlAst.AtEnd => " @ end()"
      case t => s" @ $t"
    }.getOrElse("")

  private def grouping(g: AggGroup): String = g match {
    case AggGroup.All => ""
    case AggGroup.By(ls) => s" by (${ls.map(labelName).mkString(",")})"
    case AggGroup.Without(ls) =>
      s" without (${ls.map(labelName).mkString(",")})"
  }

  private def matching(m: Option[VectorMatching], boolMod: Boolean): String = {
    val b = if (boolMod) " bool" else ""
    m match {
      case None => b
      case Some(vm) =>
        val onPart = vm.on.map(ls => s" on(${ls.map(labelName).mkString(",")})")
          .orElse(vm.ignoring.map(ls =>
            s" ignoring(${ls.map(labelName).mkString(",")})"))
          .getOrElse("")
        val grp =
          if (vm.groupLeft) " group_left" else if (vm.groupRight) " group_right" else ""
        b + onPart + grp
    }
  }

  private def negLit(e: PromExpr): Boolean = e match {
    // a literal that PRINTS with a leading '-' (the unary fold makes
    // these) re-parses as a Neg, so it needs the same parenthesization
    // as Neg in power/postfix contexts
    case NumberLit(v) =>
      v < 0 || v == Double.NegativeInfinity || (v == 0.0 && 1.0 / v < 0)
    case _ => false
  }

  private def p(e: PromExpr, ctx: Int): String = e match {
    case n @ NumberLit(v) =>
      val out = renderNum(v)
      if (negLit(n) && ctx > 5) "(" + out + ")" else out
    case StringLit(s) => quote(s)
    case s: VectorSelector => selector(s)
    case RangeSelector(s, r) =>
      // offset and @ render AFTER the range per the grammar:
      // x[5m] offset 1h @ 300. selectorBase quotes non-bare names —
      // the raw `name.getOrElse` spelling printed `b.total[1h]`
      // unparseably (r16 fuzz catch once the generator drew dotted
      // names)
      selectorBase(s) +
        s"[${PromQlDurations.render(r)}]" + offsetSuffix(s.offsetSec) + atSuffix(s.atSec)
    case Subquery(inner, r, step) =>
      // subquery binds tighter than any binary op; parenthesize any
      // non-atomic inner expression for re-parse fidelity
      val innerStr = inner match {
        case _: Binary | _: Neg => "(" + p(inner, 0) + ")"
        case n: NumberLit if negLit(n) => "(" + p(inner, 0) + ")"
        case _ => p(inner, 0)
      }
      innerStr + s"[${PromQlDurations.render(r)}:${step.map(PromQlDurations.render).getOrElse("")}]"
    case Call(fn, args) => s"$fn(${args.map(p(_, 0)).mkString(", ")})"
    case Agg(op, inner, param, g) =>
      s"$op${grouping(g)}(${(param.toSeq :+ inner).map(p(_, 0)).mkString(", ")})"
    case Neg(inner) =>
      val s = inner match {
        case _: Binary | _: Neg => "(" + p(inner, 0) + ")"
        case _ => p(inner, 0)
      }
      val out = "-" + s
      // unary minus binds between the multiplicative ops and `^`
      // (PromQL: `-1^2` is `-(1^2)`), so only a power context forces parens
      if (ctx > 5) "(" + out + ")" else out
    case Binary(op, l, r, m, b) =>
      val pr = prec(op)
      // all ops left-associative except ^ (right-associative)
      val (lCtx, rCtx) = if (op == "^") (pr + 1, pr) else (pr, pr + 1)
      val out = p(l, lCtx) + s" $op${matching(m, b)} " + p(r, rCtx)
      if (pr < ctx) "(" + out + ")" else out
  }
}
