package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Firehose

/** PromQL vector-matching binary ops (m29): on/ignoring label selection,
  * group_left one-to-many, the runtime many-to-many cardinality error, and
  * the fused same-source form's equivalence to the generic join form.
  */
class VectorMatchSpec extends SparkSuite {

  /** Instant vector from (name, labels-pairs, value) tuples. */
  private def vec(rows: Seq[(String, Seq[(String, String)], Double)]): DataFrame = {
    import spark.implicits._
    rows
      .map { case (n, ls, v) => (n, ls.map(_._1), ls.map(_._2), v) }
      .toDF("name", "_ks", "_vs", "value")
      .select(
        lit("app").as("component"), col("name"),
        map_from_arrays(col("_ks"), col("_vs")).as("labels"), col("value"))
  }

  test("one-to-one match on the full label set with a guarded divide") {
    val errs = vec(Seq(
      ("err", Seq("user" -> "1", "path" -> "/a"), 4.0),
      ("err", Seq("user" -> "2", "path" -> "/a"), 6.0),
      ("err", Seq("user" -> "9", "path" -> "/z"), 1.0))) // no matching view
    val views = vec(Seq(
      ("view", Seq("user" -> "1", "path" -> "/a"), 8.0),
      ("view", Seq("user" -> "2", "path" -> "/a"), 0.0), // zero den → dropped
      ("view", Seq("user" -> "3", "path" -> "/b"), 5.0)))
    val out = Firehose.vectorMatch(
        errs, views, (e, v) => when(v =!= 0.0, e / v), out = "ratio")
      .select("series", "ratio").collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(out.toMap === Map("path=/a,user=1" -> 0.5))
    // left identity survives: name column is the left's
    val names = Firehose.vectorMatch(
        errs, views, (e, v) => when(v =!= 0.0, e / v), out = "ratio")
      .select("name").collect().map(_.getString(0)).toSet
    assert(names === Set("err"))
  }

  test("on() matches the named labels only; ignoring() drops the named labels") {
    val l = vec(Seq(("a", Seq("user" -> "1", "dc" -> "east"), 10.0)))
    val r = vec(Seq(("b", Seq("user" -> "1", "dc" -> "west"), 5.0)))
    // full-set matching: dc differs → empty
    assert(Firehose.vectorMatch(l, r, (x, y) => x - y).count() === 0)
    // on(user): dc excluded from the key → matches
    val on = Firehose.vectorMatch(l, r, (x, y) => x - y, on = Seq("user"))
      .select("series", "value").collect()
    assert(on.map(row => (row.getString(0), row.getDouble(1))).toSeq ===
      Seq(("dc=east,user=1", 5.0)))
    // ignoring(dc): same key as on(user) here
    val ign = Firehose.vectorMatch(l, r, (x, y) => x - y, ignoring = Seq("dc"))
      .select("value").collect()
    assert(ign.map(_.getDouble(0)).toSeq === Seq(5.0))
  }

  test("group_left fans one right row out to many left series") {
    val lefts = vec(Seq(
      ("cpu", Seq("user" -> "1", "core" -> "0"), 2.0),
      ("cpu", Seq("user" -> "1", "core" -> "1"), 6.0),
      ("cpu", Seq("user" -> "2", "core" -> "0"), 3.0)))
    val totals = vec(Seq(
      ("tot", Seq("user" -> "1"), 8.0),
      ("tot", Seq("user" -> "2"), 3.0)))
    val out = Firehose.vectorMatch(
        lefts, totals, (v, t) => v / t, on = Seq("user"), groupLeft = true,
        out = "share")
      .select("series", "share").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out === Map(
      "core=0,user=1" -> 0.25, "core=1,user=1" -> 0.75, "core=0,user=2" -> 1.0))
  }

  test("many-to-many raises at runtime, as PromQL does") {
    val l = vec(Seq(
      ("a", Seq("user" -> "1", "core" -> "0"), 1.0),
      ("a", Seq("user" -> "1", "core" -> "1"), 2.0)))
    val r = vec(Seq(("b", Seq("user" -> "1"), 5.0)))
    // left not unique per on(user) key without group_left → error
    val ex = intercept[Exception] {
      Firehose.vectorMatch(l, r, (x, y) => x / y, on = Seq("user")).collect()
    }
    assert(ex.getMessage.contains("vector match") ||
      Option(ex.getCause).exists(_.getMessage.contains("vector match")))
    // duplicate right rows per key → error even with group_left
    val rDup = vec(Seq(
      ("b", Seq("user" -> "1", "rep" -> "x"), 5.0),
      ("b", Seq("user" -> "1", "rep" -> "y"), 7.0)))
    val ex2 = intercept[Exception] {
      Firehose.vectorMatch(l, rDup, (x, y) => x / y, on = Seq("user"),
        groupLeft = true).collect()
    }
    assert(ex2.getMessage.contains("vector match") ||
      Option(ex2.getCause).exists(_.getMessage.contains("vector match")))
  }

  test("set ops: and keeps matched, unless keeps unmatched, or has left priority") {
    val errs = vec(Seq(
      ("err", Seq("user" -> "1"), 4.0),
      ("err", Seq("user" -> "2"), 6.0)))
    val silenced = vec(Seq(
      ("silence", Seq("user" -> "2"), 1.0),
      ("silence", Seq("user" -> "3"), 1.0)))
    def series(df: org.apache.spark.sql.DataFrame) =
      df.select("name", "series", "value").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(series(Firehose.vectorSetOp(errs, silenced, "and")) ===
      Set(("err", "user=2", 6.0)))
    assert(series(Firehose.vectorSetOp(errs, silenced, "unless")) ===
      Set(("err", "user=1", 4.0)))
    // or: both left entries win; right contributes only its unmatched key
    assert(series(Firehose.vectorSetOp(errs, silenced, "or")) ===
      Set(("err", "user=1", 4.0), ("err", "user=2", 6.0),
        ("silence", "user=3", 1.0)))
    // set ops allow many-to-many (no cardinality error): duplicate right
    // keys must not duplicate left rows under and
    val dup = vec(Seq(
      ("silence", Seq("user" -> "2"), 1.0),
      ("silence", Seq("user" -> "2"), 2.0)))
    assert(Firehose.vectorSetOp(errs, dup, "and").count() === 1)
    // on(): match key restricted to the named labels
    val r2 = vec(Seq(("silence", Seq("user" -> "1", "dc" -> "west"), 1.0)))
    assert(series(Firehose.vectorSetOp(errs, r2, "and", on = Seq("user"))) ===
      Set(("err", "user=1", 4.0)))
    intercept[IllegalArgumentException] {
      Firehose.vectorSetOp(errs, silenced, "xor")
    }
  }

  test("comparison with bool modifier yields 0/1 and drops nothing") {
    val l = vec(Seq(
      ("err", Seq("user" -> "1"), 9.0),
      ("err", Seq("user" -> "2"), 1.0)))
    val r = vec(Seq(
      ("view", Seq("user" -> "1"), 5.0),
      ("view", Seq("user" -> "2"), 5.0)))
    val out = Firehose.vectorMatch(
        l, r, (e, v) => (e > v).cast("double"), out = "gt")
      .select("series", "gt").collect()
      .map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(out === Map("user=1" -> 1.0, "user=2" -> 0.0))
  }

  test("set ops and arithmetic match a brute-force model on random vectors") {
    // differential fuzz: random instant vectors with random label subsets,
    // every op checked against driver-side set/map arithmetic on the same
    // match-key definition
    val rnd = new scala.util.Random(7L)
    for (round <- 0 until 3) {
      def randVec(name: String, n: Int): Seq[(String, Seq[(String, String)], Double)] =
        // distinct full label sets (duplicate series would collapse in the
        // gauge registry upstream; set ops don't care, arithmetic raises)
        rnd.shuffle((0 until 20).toList).take(n).map { i =>
          val labels = Seq("user" -> s"u${i % 10}", "dc" -> (if (i < 10) "east" else "west"))
          (name, labels, rnd.nextInt(100).toDouble)
        }
      val lRows = randVec("err", 2 + rnd.nextInt(8))
      val rRows = randVec("cap", 2 + rnd.nextInt(8))
      val l = vec(lRows)
      val r = vec(rRows)
      // model: match key = full label set, rendered like seriesKey
      def key(ls: Seq[(String, String)]): String =
        ls.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")
      val lKeys = lRows.map(t => key(t._2)).toSet
      val rKeys = rRows.map(t => key(t._2)).toSet
      def got(op: String): Set[String] =
        Firehose.vectorSetOp(l, r, op).select("series").collect()
          .map(_.getString(0)).toSet
      assert(got("and") === (lKeys intersect rKeys), s"round=$round and")
      assert(got("unless") === (lKeys diff rKeys), s"round=$round unless")
      assert(got("or") === (lKeys union rKeys), s"round=$round or")
      // arithmetic one-to-one on the same keys: sum matches the model map
      val lVal = lRows.map(t => key(t._2) -> t._3).toMap
      val rVal = rRows.map(t => key(t._2) -> t._3).toMap
      val sums = Firehose.vectorMatch(l, r, (a, b) => a + b, out = "s")
        .select("series", "s").collect()
        .map(row => row.getString(0) -> row.getDouble(1)).toMap
      val want = (lKeys intersect rKeys).map(k => k -> (lVal(k) + rVal(k))).toMap
      assert(sums === want, s"round=$round arithmetic")
    }
  }

  test("fused same-source form equals the generic join form") {
    import spark.implicits._
    // windowed increases for two counters over shared (series, window) keys
    val inc = Seq(
      ("err", "user=1", 0L, 2.0), ("view", "user=1", 0L, 8.0),
      ("err", "user=1", 60L, 3.0), ("view", "user=1", 60L, 0.0), // den 0 → drop
      ("err", "user=2", 0L, 5.0), // missing den → drop
      ("view", "user=3", 0L, 4.0)) // missing num → drop
      .toDF("name", "series", "win_start", "increase")
      .withColumn("component", lit("app"))
    val fused = Firehose.vectorMatchSameSource(
        inc, Seq("component", "series", "win_start"), "err", "view",
        (n, d) => when(d > 0, n / d), "ratio", valueCol = "increase")
      .select("series", "win_start", "ratio").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(fused === Map(("user=1", 0L) -> 0.25))
    // generic form over the same operands, matched on the full label set
    def side(n: String) = inc.filter(col("name") === n)
      .select(col("component"), col("name"),
        map(lit("series"), col("series"),
          lit("win"), col("win_start").cast("string")).as("labels"),
        col("increase").as("value"))
    val joined = Firehose.vectorMatch(
        side("err"), side("view"), (n, d) => when(d > 0, n / d), out = "ratio")
      .select("ratio").collect().map(_.getDouble(0)).toSeq
    assert(joined === Seq(0.25))
  }
}
