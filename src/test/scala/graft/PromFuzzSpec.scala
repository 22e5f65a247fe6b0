package graft

import org.apache.spark.sql.functions._

import graft.operators.Firehose
import graft.sources.PromSource

/** Randomized parity property for the shared exposition grammar: for ANY
  * generated line — well-formed (escaped quotes/backslashes/newlines,
  * ±Inf/NaN values, optional timestamps, trailing commas) or corrupted
  * (block residue, unbalanced quotes, bad tokens) — the DSv2 scanner and
  * the expression parser must make the SAME keep/drop decision and produce
  * the SAME (metric, series, value, ts) when keeping. This pins the
  * cannot-drift claim far beyond the hand-written adversarial cases.
  * Seeded RNG → deterministic (the repo's property-test convention).
  */
class PromFuzzSpec extends SparkSuite {

  private val rnd = new scala.util.Random(20260813L)

  // nasty raw label values: spaces, commas, braces, '=', quotes,
  // backslashes, raw newlines, runs of backslashes before 'n'
  private def randLabelValue(): String = {
    val chars = "abXZ 019,{}=\"\\\n:/.-n"
    val n = rnd.nextInt(12)
    (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
  }

  private def escape(v: String): String = v.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case '\n' => "\\n"
    case c => c.toString
  }

  private def randValueTok(): String = rnd.nextInt(8) match {
    case 0 => "+Inf"
    case 1 => "-Inf"
    case 2 => "NaN"
    case 3 => "Inf"
    case 4 => rnd.nextInt(1000).toString
    case 5 => f"${rnd.nextDouble() * 100}%.6f"
    case 6 => s"${rnd.nextInt(100)}e${rnd.nextInt(4)}"
    case _ => "notanum" + rnd.nextInt(10) // malformed: both must drop
  }

  private def randLine(): String = {
    val metric = s"m${rnd.nextInt(100)}_total"
    val nLabels = rnd.nextInt(4)
    val block =
      if (nLabels == 0 && rnd.nextBoolean()) ""
      else {
        val pairs = (0 until nLabels).map(i => s"""k$i="${escape(randLabelValue())}"""")
        val trail = if (rnd.nextBoolean() && nLabels > 0) "," else ""
        "{" + pairs.mkString(",") + trail + "}"
      }
    val ts =
      if (rnd.nextBoolean()) s" ${1700000000000L + rnd.nextInt(100000)}" else ""
    s"$metric$block ${randValueTok()}$ts"
  }

  private def corrupt(line: String): String = rnd.nextInt(4) match {
    case 0 => line.replaceFirst("\\{", "{oops ") // block residue
    case 1 => line.replaceFirst("\"", "") // unbalance a quote
    case 2 => line + " extra trailing token"
    case _ => line.replaceFirst("=", "~")
  }

  test("scanner and expression parser agree on 600 fuzzed lines") {
    val lines = (1 to 500).map(_ => randLine()) ++
      (1 to 100).map(_ => corrupt(randLine()))
    // canonicalize values through bit patterns so NaN compares equal
    def canon(metric: String, series: String, value: Double, ts: Option[Long]) =
      (metric, series, java.lang.Double.doubleToLongBits(value), ts)
    val viaScanner = lines
      .flatMap(PromSource.parseLine)
      .map(t => canon(t._1, t._2, t._3, Option(t._4).map(_.longValue())))
      .sorted
    import spark.implicits._
    val viaExpr = Firehose.promParse(lines.toDF("line"))
      .collect()
      .map(r => canon(r.getString(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSeq
      .sorted
    assert(viaExpr === viaScanner)
    // the generator must actually exercise both outcomes
    assert(viaScanner.size > 200, s"too few kept lines: ${viaScanner.size}")
    assert(viaScanner.size < lines.size, "no line was dropped — fuzzer too tame")
  }
}
