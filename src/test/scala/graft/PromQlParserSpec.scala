package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.promql._

/** Parser unit tests + the canonical-print round trip: precedence,
  * associativity, durations, matchers, modifiers, errors — and a
  * deterministic AST fuzz pinning `parse(print(ast)) == ast`.
  */
class PromQlParserSpec extends AnyFunSuite {

  private def p(q: String): PromExpr = PromQlParser.parse(q)

  test("bare and braced selectors") {
    assert(p("view_total") === VectorSelector(Some("view_total")))
    assert(p("""view_total{user="5"}""") ===
      VectorSelector(Some("view_total"), Seq(LabelMatcher("user", MatchOp.Eq, "5"))))
    assert(p("""{__name__=~"view.*", user!="5"}""") ===
      VectorSelector(None, Seq(
        LabelMatcher("__name__", MatchOp.Re, "view.*"),
        LabelMatcher("user", MatchOp.Neq, "5"))))
  }

  test("all four matcher operators and escapes") {
    val sel = p("""m{a="x", b!="y", c=~"z.*", d!~"w|q", e="q\"\\\n"}""")
      .asInstanceOf[VectorSelector]
    assert(sel.matchers.map(_.op) ===
      Seq(MatchOp.Eq, MatchOp.Neq, MatchOp.Re, MatchOp.NotRe, MatchOp.Eq))
    assert(sel.matchers.last.value === "q\"\\\n")
  }

  test("durations: compound units, sub-second rejection") {
    assert(p("x[1h30m]") === RangeSelector(VectorSelector(Some("x")), 5400L))
    assert(p("x[90s]") === RangeSelector(VectorSelector(Some("x")), 90L))
    assert(p("x[2d]") === RangeSelector(VectorSelector(Some("x")), 172800L))
    assert(p("x[5000ms]") === RangeSelector(VectorSelector(Some("x")), 5L))
    assertThrows[PromQlParseException](p("x[250ms]"))
    assertThrows[PromQlParseException](p("x[0s]"))
  }

  test("offset binds to the selector, before or after the range") {
    assert(p("x offset 5m") === VectorSelector(Some("x"), Nil, 300L))
    assert(p("x[1h] offset 5m") ===
      RangeSelector(VectorSelector(Some("x"), Nil, 300L), 3600L))
    assert(p("x offset -5m") === VectorSelector(Some("x"), Nil, -300L))
    assertThrows[PromQlParseException](p("(a + b) offset 5m"))
  }

  test("@ pins a selector to a fixed unix timestamp") {
    assert(p("x @ 1704100000") ===
      VectorSelector(Some("x"), Nil, 0L, Some(1704100000L)))
    assert(p("x[5m] @ 1704100000") ===
      RangeSelector(VectorSelector(Some("x"), Nil, 0L, Some(1704100000L)), 300L))
    // offset and @ compose in either order after the range
    assert(p("x[5m] offset 1h @ 7") ===
      RangeSelector(VectorSelector(Some("x"), Nil, 3600L, Some(7L)), 300L))
    assert(p("x[5m] @ 7 offset 1h") ===
      RangeSelector(VectorSelector(Some("x"), Nil, 3600L, Some(7L)), 300L))
    assertThrows[PromQlParseException](p("x @ 1.5"))
    assertThrows[PromQlParseException](p("x @ 7 @ 8"))
    assertThrows[PromQlParseException](p("(a + b) @ 7"))
  }

  test("subquery with and without explicit step") {
    assert(p("rate(x[1h])[6h:1h]") ===
      Subquery(Call("rate", Seq(RangeSelector(VectorSelector(Some("x")), 3600L))),
        21600L, Some(3600L)))
    assert(p("x[6h:]") === Subquery(VectorSelector(Some("x")), 21600L, None))
  }

  test("arithmetic precedence and associativity") {
    assert(p("a + b * c") ===
      Binary("+", VectorSelector(Some("a")),
        Binary("*", VectorSelector(Some("b")), VectorSelector(Some("c")))))
    assert(p("a * b + c") ===
      Binary("+",
        Binary("*", VectorSelector(Some("a")), VectorSelector(Some("b"))),
        VectorSelector(Some("c"))))
    assert(p("a - b - c") ===
      Binary("-",
        Binary("-", VectorSelector(Some("a")), VectorSelector(Some("b"))),
        VectorSelector(Some("c"))))
    // ^ is right-associative
    assert(p("2 ^ 3 ^ 2") ===
      Binary("^", NumberLit(2),
        Binary("^", NumberLit(3), NumberLit(2))))
    // parens override
    assert(p("(a + b) * c") ===
      Binary("*",
        Binary("+", VectorSelector(Some("a")), VectorSelector(Some("b"))),
        VectorSelector(Some("c"))))
  }

  test("unary minus binds looser than ^ (PromQL: -1^2 is -(1^2))") {
    assert(p("-x ^ 2") ===
      Neg(Binary("^", VectorSelector(Some("x")), NumberLit(2))))
    assert(p("-5") === NumberLit(-5))
    assert(p("2 ^ -3") === Binary("^", NumberLit(2), NumberLit(-3)))
  }

  test("negative literals round-trip through power/postfix contexts") {
    // (-5)^2 folds to Binary(^, NumberLit(-5), 2); the printer must
    // parenthesize the negative literal or the reparse flips it to
    // -(5^2) — same in the subquery-postfix position
    for (q <- Seq("(-5) ^ 2", "2 ^ (-3) ^ 2", "(-5)[1h:]", "-5 ^ 2")) {
      val ast = p(q)
      assert(p(graft.promql.PromQlPrinter.print(ast)) === ast, q)
    }
    // Inf/NaN are number literals (case-insensitive), never selectors,
    // and they survive the print round trip
    assert(p("Inf") === NumberLit(Double.PositiveInfinity))
    assert(p("-inf") === NumberLit(Double.NegativeInfinity))
    assert(p(graft.promql.PromQlPrinter.print(p("x > Inf")))
      === Binary(">", VectorSelector(Some("x")),
        NumberLit(Double.PositiveInfinity)))
    val nan = p("NaN")
    assert(nan.isInstanceOf[NumberLit] &&
      nan.asInstanceOf[NumberLit].v.isNaN)
    // -0 keeps its sign through the round trip
    assert(graft.promql.PromQlPrinter.print(p("-0")) === "-0")
  }

  test("atan2 binds like multiplication and is a reserved keyword") {
    val (a, b, c) = (VectorSelector(Some("a")), VectorSelector(Some("b")),
      VectorSelector(Some("c")))
    assert(p("a atan2 b + c") === Binary("+", Binary("atan2", a, b), c))
    assert(p("a + b atan2 c") === Binary("+", a, Binary("atan2", b, c)))
    // unary and power bind tighter
    assert(p("a atan2 b ^ 2") ===
      Binary("atan2", a, Binary("^", b, NumberLit(2))))
    assert(p("a atan2 -b") === Binary("atan2", a, Neg(b)))
    // vector-matching modifiers attach like any arithmetic operator
    assert(p("a atan2 on (user) b") ===
      Binary("atan2", a, b, Some(VectorMatching(on = Some(Seq("user"))))))
    // round trip, left-associativity preserved
    for (q <- Seq("a atan2 b atan2 c", "(a + b) atan2 c", "a atan2 (b or c)")) {
      val ast = p(q)
      assert(p(PromQlPrinter.print(ast)) === ast, q)
    }
    // reserved: a bare metric named atan2 needs {__name__="atan2"}
    assertThrows[PromQlParseException](p("atan2"))
    // bool is a comparison-only modifier
    assertThrows[PromQlParseException](p("a atan2 bool b"))
  }

  test("comparison, set-op and arithmetic layering") {
    // or < and/unless < comparison < add < mul
    assert(p("a and b or c") ===
      Binary("or",
        Binary("and", VectorSelector(Some("a")), VectorSelector(Some("b"))),
        VectorSelector(Some("c"))))
    assert(p("a > b + c") ===
      Binary(">", VectorSelector(Some("a")),
        Binary("+", VectorSelector(Some("b")), VectorSelector(Some("c")))))
    assert(p("a unless b > c") ===
      Binary("unless", VectorSelector(Some("a")),
        Binary(">", VectorSelector(Some("b")), VectorSelector(Some("c")))))
  }

  test("bool and matching modifiers") {
    assert(p("a > bool b") ===
      Binary(">", VectorSelector(Some("a")), VectorSelector(Some("b")),
        None, boolMod = true))
    assert(p("a / on(user) b") ===
      Binary("/", VectorSelector(Some("a")), VectorSelector(Some("b")),
        Some(VectorMatching(on = Some(Seq("user"))))))
    assert(p("a * ignoring(unit, host) group_left b") ===
      Binary("*", VectorSelector(Some("a")), VectorSelector(Some("b")),
        Some(VectorMatching(ignoring = Some(Seq("unit", "host")), groupLeft = true))))
    assert(p("a and on() b") ===
      Binary("and", VectorSelector(Some("a")), VectorSelector(Some("b")),
        Some(VectorMatching(on = Some(Nil)))))
    assertThrows[PromQlParseException](p("a + bool b"))
  }

  test("aggregations: grouping before or after, parameters") {
    assert(p("sum by (user) (x)") ===
      Agg("sum", VectorSelector(Some("x")), None, AggGroup.By(Seq("user"))))
    assert(p("sum(x) by (user)") ===
      Agg("sum", VectorSelector(Some("x")), None, AggGroup.By(Seq("user"))))
    assert(p("avg without (unit) (x)") ===
      Agg("avg", VectorSelector(Some("x")), None, AggGroup.Without(Seq("unit"))))
    assert(p("topk(5, x)") ===
      Agg("topk", VectorSelector(Some("x")), Some(NumberLit(5)), AggGroup.All))
    assert(p("quantile(0.9, x)") ===
      Agg("quantile", VectorSelector(Some("x")), Some(NumberLit(0.9)), AggGroup.All))
    assert(p("""count_values("v", x)""") ===
      Agg("count_values", VectorSelector(Some("x")), Some(StringLit("v")), AggGroup.All))
    assertThrows[PromQlParseException](p("topk(x)"))
    assertThrows[PromQlParseException](p("sum(5, x)"))
  }

  test("function calls, nested") {
    assert(p("rate(view_total[5m])") ===
      Call("rate", Seq(RangeSelector(VectorSelector(Some("view_total")), 300L))))
    assert(p("clamp(abs(x), 0, 10)") ===
      Call("clamp", Seq(
        Call("abs", Seq(VectorSelector(Some("x")))), NumberLit(0), NumberLit(10))))
    assert(p("""label_replace(x, "tier", "$1", "user", "^(\\d)")""") ===
      Call("label_replace", Seq(VectorSelector(Some("x")),
        StringLit("tier"), StringLit("$1"), StringLit("user"), StringLit("^(\\d)"))))
  }

  test("errors carry positions; malformed inputs rejected") {
    val e = intercept[PromQlParseException](p("sum by (user x)"))
    assert(e.pos > 0)
    assertThrows[PromQlParseException](p("x{user=5}"))   // unquoted value
    assertThrows[PromQlParseException](p("x["))
    assertThrows[PromQlParseException](p("x + "))
    assertThrows[PromQlParseException](p("(x"))
    assertThrows[PromQlParseException](p("x y"))          // trailing input
    assertThrows[PromQlParseException](p("a * group_left(extra) b")) // include labels unsupported
  }

  test("Prometheus 3.x quoted UTF-8 names: selectors, grouping lists, " +
      "and the printer's quoted round trip") {
    // bare quoted string = the metric-name shorthand
    assert(p("""{"my.metric"}""") ===
      VectorSelector(None, Seq(LabelMatcher("__name__", MatchOp.Eq, "my.metric"))))
    // combined with quoted and bare label names, any order
    assert(p("""{"my.metric", "label.x"="v", user!="3"}""") ===
      VectorSelector(None, Seq(
        LabelMatcher("__name__", MatchOp.Eq, "my.metric"),
        LabelMatcher("label.x", MatchOp.Eq, "v"),
        LabelMatcher("user", MatchOp.Neq, "3"))))
    assert(p("""{x=~"a|b", "m"}""") ===
      VectorSelector(None, Seq(
        LabelMatcher("x", MatchOp.Re, "a|b"),
        LabelMatcher("__name__", MatchOp.Eq, "m"))))
    // quoted label names on a NAMED selector
    assert(p("""x{"l w"=~"a|b"}""") ===
      VectorSelector(Some("x"), Seq(LabelMatcher("l w", MatchOp.Re, "a|b"))))
    // the metric name must not be set twice
    assertThrows[PromQlParseException](p("""foo{"bar"}"""))
    assertThrows[PromQlParseException](p("""{"a", "b"}"""))
    // quoted names in grouping and matching lists
    assert(p("""sum by ("a.b") (x)""") ===
      Agg("sum", VectorSelector(Some("x")), None, AggGroup.By(Seq("a.b"))))
    assert(p("""a / on("k 1") b""") ===
      Binary("/", VectorSelector(Some("a")), VectorSelector(Some("b")),
        Some(VectorMatching(on = Some(Seq("k 1")))), boolMod = false))
    // print → parse round trips for non-identifier names (the printer
    // quotes them) and for names that would re-lex as something else
    // entirely (keywords, the Inf/NaN literals → the {"name"} form)
    for (q <- Seq(
        """{"my.metric"}""", """{"my.metric",user="1"}""",
        """x{"l w"=~"a|b"}""", """sum by ("a.b") ({"m.n"})""",
        """a / on("k 1") b""",
        """sum without ("µ-label") (x{"é"!~"z.*"})""")) {
      val ast = p(q)
      assert(p(PromQlPrinter.print(ast)) === ast, q)
    }
    for (weird <- Seq("my.metric", "and", "inf", "NaN", "0abc", "a b")) {
      val ast = VectorSelector(Some(weird), Seq(LabelMatcher("u", MatchOp.Eq, "1")))
      val printed = PromQlPrinter.print(ast)
      // semantic equivalence: the quoted form re-parses as the __name__
      // matcher shorthand
      assert(p(printed) === VectorSelector(None, Seq(
        LabelMatcher("__name__", MatchOp.Eq, weird),
        LabelMatcher("u", MatchOp.Eq, "1"))), weird)
    }
  }

  test("comments and whitespace are skipped") {
    assert(p("x # trailing comment") === VectorSelector(Some("x")))
    assert(p("sum( # inner\n  x\n)") === Agg("sum", VectorSelector(Some("x"))))
  }

  // ---- canonical-print round trip ----

  test("print/parse round trip on a hand-picked corpus") {
    val corpus = Seq(
      """sum by (user) (increase(view_total{user=~"1.*"}[1h]))""",
      """topk(3, sum by (user) (increase(view_total[1h])))""",
      """increase(error_total[1h]) / (increase(view_total[1h]) > 0)""",
      """max_over_time(increase(view_total[1h])[6h:1h])""",
      """a / on(user) group_left b""",
      """(a + b) * c - -d""",
      """rate(x[5m] offset 1h)""",
      """avg without (unit) (x) > bool 0.5""",
      """e and on() v or u""",
      """histogram_quantile(0.9, sum by (le) (increase(b[1h])))""",
      """clamp(-x ^ 2, -1, 1)""",
      """2 ^ 3 ^ 2 % 5""")
    corpus.foreach { q =>
      val ast = p(q)
      val printed = PromQlPrinter.print(ast)
      assert(p(printed) === ast, s"round trip failed for '$q' -> '$printed'")
    }
  }

  test("fuzz: parse(print(ast)) == ast over generated ASTs") {
    val rnd = new scala.util.Random(20260814L)
    val labels = Seq("user", "unit", "host")
    val names = Seq("view_total", "error_total", "click_total")
    val durs = Seq(60L, 300L, 3600L, 5400L, 21600L, 86400L)

    def genSel(): VectorSelector = {
      val ms = Seq.fill(rnd.nextInt(3)) {
        val op = Seq(MatchOp.Eq, MatchOp.Neq, MatchOp.Re, MatchOp.NotRe)(rnd.nextInt(4))
        LabelMatcher(labels(rnd.nextInt(labels.length)), op, "v" + rnd.nextInt(5))
      }
      val off = Seq(0L, 0L, 300L, -300L)(rnd.nextInt(4))
      val at = Seq(None, None, None, Some(1704100000L))(rnd.nextInt(4))
      VectorSelector(Some(names(rnd.nextInt(names.length))), ms, off, at)
    }

    def genRange(): PromExpr = {
      val fn = Seq("rate", "increase", "avg_over_time", "max_over_time",
        "delta", "resets")(rnd.nextInt(6))
      Call(fn, Seq(RangeSelector(genSel(), durs(rnd.nextInt(durs.length)))))
    }

    def gen(depth: Int): PromExpr =
      if (depth <= 0) {
        if (rnd.nextBoolean()) genSel() else NumberLit(rnd.nextInt(100).toDouble)
      } else rnd.nextInt(6) match {
        case 0 => genRange()
        case 1 =>
          val g = rnd.nextInt(3) match {
            case 0 => AggGroup.All
            case 1 => AggGroup.By(Seq(labels(rnd.nextInt(labels.length))))
            case 2 => AggGroup.Without(Seq(labels(rnd.nextInt(labels.length))))
          }
          Agg(Seq("sum", "avg", "min", "max", "count")(rnd.nextInt(5)), gen(depth - 1), None, g)
        case 2 =>
          val op = Seq("+", "-", "*", "/", "%", "^", "atan2")(rnd.nextInt(7))
          val vm = rnd.nextInt(3) match {
            case 0 => None
            case 1 => Some(VectorMatching(on = Some(Seq(labels(rnd.nextInt(labels.length))))))
            case 2 => Some(VectorMatching(ignoring = Some(Seq(labels(rnd.nextInt(labels.length))))))
          }
          Binary(op, gen(depth - 1), gen(depth - 1), vm)
        case 3 =>
          val op = Seq("==", "!=", "<", ">", "<=", ">=")(rnd.nextInt(6))
          Binary(op, gen(depth - 1), gen(depth - 1), None, boolMod = rnd.nextBoolean())
        case 4 =>
          val op = Seq("and", "or", "unless")(rnd.nextInt(3))
          Binary(op, gen(depth - 1), gen(depth - 1),
            if (rnd.nextBoolean()) Some(VectorMatching(on = Some(Seq("user")))) else None)
        case 5 => gen(depth - 1) match {
          case n: NumberLit => n // Neg(lit) folds; keep the literal
          case other => Neg(other)
        }
      }

    (1 to 300).foreach { i =>
      val ast = gen(3)
      val printed = PromQlPrinter.print(ast)
      val reparsed =
        try PromQlParser.parse(printed)
        catch {
          case e: PromQlParseException =>
            fail(s"iteration $i: '$printed' failed to reparse: $e")
        }
      assert(reparsed === ast, s"iteration $i: '$printed'")
    }
  }
}
