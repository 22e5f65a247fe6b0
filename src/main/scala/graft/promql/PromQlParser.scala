package graft.promql

/** Parse error with the 0-based character offset where it was detected. */
final case class PromQlParseException(msg: String, pos: Int)
  extends RuntimeException(s"$msg (at offset $pos)")

/** Hand-rolled lexer + recursive-descent parser for the PromQL subset in
  * [[PromQlAst]]. Grammar and precedence follow the Prometheus parser:
  * `or` < `and`/`unless` < comparisons < `+ -` < `* / % atan2` < unary < `^`
  * (right-associative), with `bool` / `on` / `ignoring` /
  * `group_left` / `group_right` as post-operator modifiers, and
  * `[range]` / `[range:step]` / `offset d` as postfix forms. Grouping
  * parens are stripped (the printer re-inserts them), so the AST is
  * canonical.
  */
object PromQlParser {

  // ---- lexer ----

  private sealed trait Tok { def pos: Int }
  private final case class TIdent(s: String, pos: Int) extends Tok
  private final case class TNumber(v: Double, pos: Int) extends Tok
  private final case class TDuration(sec: Long, pos: Int) extends Tok
  private final case class TString(s: String, pos: Int) extends Tok
  private final case class TOp(s: String, pos: Int) extends Tok
  private final case class TEof(pos: Int) extends Tok

  private val multiOps = Seq("==", "!=", "=~", "!~", "<=", ">=")
  private val singleOps = "()+-*/%^{}[],:=<>@"

  private val durationRe =
    java.util.regex.Pattern.compile("([0-9]+(?:ms|y|w|d|h|m|s))+")
  private val numberRe =
    java.util.regex.Pattern.compile("(?:[0-9]+\\.?[0-9]*|\\.[0-9]+)(?:[eE][+-]?[0-9]+)?")

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && q.charAt(i) != '\n') i += 1 }
      else if (c == '"' || c == '\'') {
        val start = i
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          q.charAt(i) match {
            case `c` => closed = true; i += 1
            case '\\' =>
              if (i + 1 >= n) throw PromQlParseException("dangling escape", i)
              q.charAt(i + 1) match {
                case 'n' => sb.append('\n')
                case 't' => sb.append('\t')
                case other => sb.append(other)
              }
              i += 2
            case other => sb.append(other); i += 1
          }
        }
        if (!closed) throw PromQlParseException("unterminated string", start)
        out += TString(sb.toString, start)
      } else if (c.isDigit || (c == '.' && i + 1 < n && q.charAt(i + 1).isDigit)) {
        // durations win over bare numbers: `5m` is a duration token
        val dm = durationRe.matcher(q).region(i, n)
        val nm = numberRe.matcher(q).region(i, n)
        if (dm.lookingAt && (nm.lookingAt() == false || dm.end > nm.end)) {
          PromQlDurations.parse(q.substring(i, dm.end)) match {
            case Right(sec) => out += TDuration(sec, i)
            case Left(err) => throw PromQlParseException(err, i)
          }
          i = dm.end
        } else if (nm.lookingAt) {
          out += TNumber(q.substring(i, nm.end).toDouble, i)
          i = nm.end
        } else throw PromQlParseException(s"unexpected character '$c'", i)
      } else if (c.isLetter || c == '_') {
        // ':' may CONTINUE an identifier (recording-rule names like
        // job:rate5m) but not start one — a leading ':' must stay an
        // operator token so subquery steps ([6h:1h]) lex correctly
        val start = i
        while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_' || q.charAt(i) == ':')) i += 1
        out += TIdent(q.substring(start, i), start)
      } else {
        multiOps.find(op => q.startsWith(op, i)) match {
          case Some(op) => out += TOp(op, i); i += op.length
          case None =>
            if (singleOps.indexOf(c) >= 0) { out += TOp(c.toString, i); i += 1 }
            else throw PromQlParseException(s"unexpected character '$c'", i)
        }
      }
    }
    out += TEof(n)
    out.result()
  }

  // ---- parser ----

  private val aggOps = Set(
    "sum", "avg", "min", "max", "count", "stddev", "stdvar", "group",
    "topk", "bottomk", "quantile", "count_values", "limitk", "limit_ratio")
  private val paramAggOps = Set(
    "topk", "bottomk", "quantile", "count_values", "limitk", "limit_ratio")
  private[promql] val keywords = Set(
    "and", "or", "unless", "atan2", "by", "without", "on", "ignoring",
    "group_left", "group_right", "offset", "bool")

  def parse(q: String): PromExpr = {
    val p = new P(lex(q))
    val e = p.parseExpr()
    p.expectEof()
    e
  }

  private final class P(toks: Vector[Tok]) {
    private var i = 0
    private def cur: Tok = toks(i)
    private def advance(): Tok = { val t = toks(i); i += 1; t }
    private def fail(msg: String): Nothing = throw PromQlParseException(msg, cur.pos)

    private def isOp(s: String): Boolean = cur match {
      case TOp(o, _) => o == s
      case _ => false
    }
    private def isIdent(s: String): Boolean = cur match {
      case TIdent(id, _) => id == s
      case _ => false
    }
    private def eatOp(s: String): Unit =
      if (isOp(s)) advance() else fail(s"expected '$s'")
    private def eatIdent(s: String): Unit =
      if (isIdent(s)) advance() else fail(s"expected '$s'")

    def expectEof(): Unit = cur match {
      case TEof(_) => ()
      case t => throw PromQlParseException("trailing input", t.pos)
    }

    def parseExpr(): PromExpr = parseBin(1)

    private def opsAt(level: Int): Set[String] = level match {
      case 1 => Set("or")
      case 2 => Set("and", "unless")
      case 3 => Set("==", "!=", "<", ">", "<=", ">=")
      case 4 => Set("+", "-")
      case 5 => Set("*", "/", "%", "atan2")
    }

    private def peekBinOp(level: Int): Option[String] = {
      val ops = opsAt(level)
      cur match {
        case TOp(o, _) if ops(o) => Some(o)
        case TIdent(id, _) if ops(id) => Some(id)
        case _ => None
      }
    }

    private def parseBin(level: Int): PromExpr = {
      if (level > 5) return parseUnary()
      var lhs = parseBin(level + 1)
      var op = peekBinOp(level)
      while (op.isDefined) {
        advance()
        val (boolMod, matching) = parseModifiers(op.get)
        val rhs = parseBin(level + 1)
        lhs = Binary(op.get, lhs, rhs, matching, boolMod)
        op = peekBinOp(level)
      }
      lhs
    }

    /** `bool`, then `on`/`ignoring`, then `group_left`/`group_right`. */
    private def parseModifiers(op: String): (Boolean, Option[VectorMatching]) = {
      var boolMod = false
      if (isIdent("bool")) {
        if (!Set("==", "!=", "<", ">", "<=", ">=")(op))
          fail("bool modifier only valid on comparison operators")
        advance(); boolMod = true
      }
      var vm: Option[VectorMatching] = None
      if (isIdent("on") || isIdent("ignoring")) {
        val isOn = isIdent("on")
        advance()
        val ls = parseLabelList()
        vm = Some(
          if (isOn) VectorMatching(on = Some(ls))
          else VectorMatching(ignoring = Some(ls)))
      }
      if (isIdent("group_left") || isIdent("group_right")) {
        val gl = isIdent("group_left")
        advance()
        if (isOp("(")) {
          advance()
          if (!isOp(")")) fail("group_left/group_right include-labels are unsupported")
          advance()
        }
        val base = vm.getOrElse(VectorMatching())
        vm = Some(base.copy(groupLeft = gl, groupRight = !gl))
      }
      (boolMod, vm)
    }

    private def parseLabelList(): Seq[String] = {
      eatOp("(")
      val ls = Seq.newBuilder[String]
      if (!isOp(")")) {
        var done = false
        while (!done) {
          cur match {
            case TIdent(id, _) => ls += id; advance()
            // Prometheus 3.x: quoted UTF-8 label names in grouping /
            // matching lists (`by ("a.b")`, `on ("x y")`)
            case TString(s, _) => ls += s; advance()
            case _ => fail("expected label name")
          }
          if (isOp(",")) advance() else done = true
        }
      }
      eatOp(")")
      ls.result()
    }

    private def parseUnary(): PromExpr = cur match {
      case TOp("-", _) => advance(); Neg(parseUnary()) match {
        // constant-fold a negated literal so `-5` is NumberLit(-5)
        case Neg(NumberLit(v)) => NumberLit(-v)
        case other => other
      }
      case TOp("+", _) => advance(); parseUnary()
      case _ => parsePow()
    }

    private def parsePow(): PromExpr = {
      val base = parsePostfix()
      if (isOp("^")) {
        advance()
        val (_, matching) = parseModifiers("^")
        // right-associative, and `2^-3` is legal: the exponent re-enters
        // at the unary level
        Binary("^", base, parseUnary(), matching, boolMod = false)
      } else base
    }

    private def parsePostfix(): PromExpr = {
      var e = parseAtom()
      var more = true
      while (more) {
        if (isOp("[")) {
          advance()
          val range = cur match {
            case TDuration(s, _) => advance(); s
            case _ => fail("expected duration")
          }
          if (isOp(":")) {
            advance()
            val step = cur match {
              case TDuration(s, _) => advance(); Some(s)
              case _ => None
            }
            eatOp("]")
            e = Subquery(e, range, step)
          } else {
            eatOp("]")
            e = e match {
              case s: VectorSelector => RangeSelector(s, range)
              case _ => fail("range selector only valid on a vector selector")
            }
          }
        } else if (isIdent("offset")) {
          advance()
          val neg = if (isOp("-")) { advance(); true } else false
          val d = cur match {
            case TDuration(s, _) => advance(); if (neg) -s else s
            case _ => fail("expected duration after offset")
          }
          e = e match {
            case s: VectorSelector =>
              if (s.offsetSec != 0) fail("duplicate offset modifier")
              s.copy(offsetSec = d)
            case RangeSelector(s, r) =>
              if (s.offsetSec != 0) fail("duplicate offset modifier")
              RangeSelector(s.copy(offsetSec = d), r)
            case _ => fail("offset only valid on a selector")
          }
        } else if (isOp("@")) {
          advance()
          val t = cur match {
            case TNumber(v, _) =>
              advance()
              if (v != math.floor(v) || math.abs(v) >= 1e15)
                fail("@ timestamp must be integral unix seconds")
              v.toLong
            case TIdent(id, _) if id == "start" || id == "end" =>
              // `@ start()` / `@ end()` — the evaluation span's bounds
              advance()
              if (!isOp("(")) fail(s"expected ( after @ $id"); advance()
              if (!isOp(")")) fail(s"expected ) after @ $id("); advance()
              if (id == "start") PromQlAst.AtStart else PromQlAst.AtEnd
            case _ => fail("expected a unix-seconds timestamp, start(), " +
              "or end() after @")
          }
          e = e match {
            case s: VectorSelector =>
              if (s.atSec.isDefined) fail("duplicate @ modifier")
              s.copy(atSec = Some(t))
            case RangeSelector(s, r) =>
              if (s.atSec.isDefined) fail("duplicate @ modifier")
              RangeSelector(s.copy(atSec = Some(t)), r)
            case _ => fail("@ only valid on a selector")
          }
        } else more = false
      }
      e
    }

    private def parseAtom(): PromExpr = cur match {
      case TNumber(v, _) => advance(); NumberLit(v)
      case TString(s, _) => advance(); StringLit(s)
      case TOp("(", _) =>
        advance()
        val e = parseExpr()
        eatOp(")")
        e
      case TOp("{", _) => parseSelector(None)
      case TIdent(id, _) if aggOps(id) && {
        val next = toks(i + 1)
        next.isInstanceOf[TOp] && next.asInstanceOf[TOp].s == "(" ||
          (next match { case TIdent(k, _) => k == "by" || k == "without"; case _ => false })
      } => parseAgg(id)
      case TIdent(id, _) if keywords(id) => fail(s"unexpected keyword '$id'")
      // PromQL's special number literals lex as identifiers here: `Inf`
      // and `NaN` (case-insensitive) are NUMBERS, unconditionally — a
      // metric literally named "inf" must be selected via
      // {__name__="inf"}, exactly Prometheus's rule
      case TIdent(id, _) if id.equalsIgnoreCase("inf") =>
        advance(); NumberLit(Double.PositiveInfinity)
      case TIdent(id, _) if id.equalsIgnoreCase("nan") =>
        advance(); NumberLit(Double.NaN)
      case TIdent(id, _) =>
        val next = toks(i + 1)
        next match {
          case TOp("(", _) =>
            advance(); advance()
            val args = Seq.newBuilder[PromExpr]
            if (!isOp(")")) {
              var done = false
              while (!done) {
                args += parseExpr()
                if (isOp(",")) advance() else done = true
              }
            }
            eatOp(")")
            Call(id, args.result())
          case _ =>
            advance()
            if (isOp("{")) parseSelector(Some(id)) else VectorSelector(Some(id))
        }
      case t => throw PromQlParseException("expected expression", t.pos)
    }

    private def parseAgg(op: String): PromExpr = {
      advance()
      var grouping: AggGroup = AggGroup.All
      def parseGrouping(): Unit = {
        if (isIdent("by")) { advance(); grouping = AggGroup.By(parseLabelList()) }
        else if (isIdent("without")) { advance(); grouping = AggGroup.Without(parseLabelList()) }
      }
      parseGrouping()
      eatOp("(")
      val first = parseExpr()
      val (param, body) =
        if (isOp(",")) {
          advance()
          if (!paramAggOps(op)) fail(s"aggregation '$op' takes no parameter")
          (Some(first), parseExpr())
        } else {
          if (paramAggOps(op)) fail(s"aggregation '$op' requires a parameter")
          (None, first)
        }
      eatOp(")")
      if (grouping == AggGroup.All) parseGrouping()
      Agg(op, body, param, grouping)
    }

    private def parseSelector(name: Option[String]): PromExpr = {
      eatOp("{")
      val ms = Seq.newBuilder[LabelMatcher]
      // Prometheus 3.x UTF-8 names: a QUOTED string in label-name
      // position is either the metric-name shorthand ({"m"} ==
      // {__name__="m"} — bare, followed by ',' or '}') or a quoted
      // LABEL name (followed by a matcher operator); the metric name
      // must not be set twice (a leading ident name or a second bare
      // string both conflict), exactly Prometheus's rule
      var nameSet = name.isDefined
      def matcherTail(label: String): Unit = {
        val op = cur match {
          case TOp("=", _) => advance(); MatchOp.Eq
          case TOp("!=", _) => advance(); MatchOp.Neq
          case TOp("=~", _) => advance(); MatchOp.Re
          case TOp("!~", _) => advance(); MatchOp.NotRe
          case _ => fail("expected matcher operator (= != =~ !~)")
        }
        val value = cur match {
          case TString(s, _) => advance(); s
          case _ => fail("expected quoted matcher value")
        }
        ms += LabelMatcher(label, op, value)
      }
      if (!isOp("}")) {
        var done = false
        while (!done) {
          cur match {
            case TIdent(id, _) => advance(); matcherTail(id)
            case TString(s, _) =>
              advance()
              cur match {
                case TOp("=" | "!=" | "=~" | "!~", _) => matcherTail(s)
                case _ =>
                  if (nameSet) fail("metric name must not be set twice")
                  nameSet = true
                  ms += LabelMatcher("__name__", MatchOp.Eq, s)
              }
            case _ => fail("expected label name")
          }
          if (isOp(",")) {
            advance()
            if (isOp("}")) done = true // trailing comma
          } else done = true
        }
      }
      eatOp("}")
      VectorSelector(name, ms.result())
    }
  }
}
