package graft

import java.math.MathContext

import org.apache.spark.sql.functions._

import graft.promql._

/** Differential fuzz of the PromQL COMPILER against an independent
  * in-memory reference interpreter: random expression trees from the
  * supported algebra, evaluated both by the compiled Spark plan and by a
  * from-scratch Scala interpreter that re-implements the documented
  * semantics (window quantization, decimal-quantized sums, reset-clamped
  * increases, IEEE-explicit division, full-label one-to-one matching,
  * left-priority set ops) over plain collections — two implementations
  * that share NOTHING but the spec, compared bit-for-bit on every
  * generated tree. The DuckDB oracles already cross-check the registered
  * queries; this covers the combinatorial space between them.
  */
class PromDiffFuzzSpec extends SparkSuite {

  // ---- the reference interpreter ----

  private type Labels = Map[String, String]
  private case class Sample(name: String, labels: Labels, ts: Long, id: String, value: Double)
  /** An instant vector: (name, labels, window) → value. */
  private type RVec = Map[(String, Labels, Long), Double]

  private val Step = 3600L

  /** The three evaluation models under differential test: the tumbling /
    * sliding window grids, and round 12's instant-at-t (Prometheus
    * `/api/v1/query` — one lookback-anchored point).
    */
  private sealed trait Mode
  private case class Grid(sliding: Boolean) extends Mode
  private case class InstantMode(
      t: Long, lookback: Long, xp: Boolean = false) extends Mode
  /** Prometheus `query_range`: every `start + i·step ≤ end` an
    * independent instant evaluation — the harness compiles ONE
    * point-grid plan and the reference evaluates [[InstantMode]] per
    * point (two decompositions of the same semantics).
    */
  private case class PointMode(
      start: Long, end: Long, step: Long, lookback: Long,
      xp: Boolean = false) extends Mode

  private def dec(d: Double, scale: Int): BigDecimal =
    BigDecimal.decimal(d, MathContext.UNLIMITED).setScale(scale, BigDecimal.RoundingMode.HALF_UP)

  private def win(ts: Long, w: Long): Long = ts - java.lang.Math.floorMod(ts, w)

  private val calFns = Seq(
    "minute", "hour", "day_of_week", "day_of_month", "day_of_year",
    "days_in_month", "month", "year")

  /** The IEEE non-finite sum algebra the engine's finite-decimal-lane
    * + flag reconstruction implements: any NaN → NaN, both infinities
    * → NaN, one infinity → that infinity, else the exact decimal sum.
    */
  private def decSumNF(vs: Seq[Double]): Double = {
    val pi = vs.contains(Double.PositiveInfinity)
    val ni = vs.contains(Double.NegativeInfinity)
    if (vs.exists(_.isNaN) || (pi && ni)) Double.NaN
    else if (pi) Double.PositiveInfinity
    else if (ni) Double.NegativeInfinity
    // past the decimal lane's cap the engine reads its IEEE-double
    // sidecar (whose partial-sum order Spark doesn't pin — the
    // generator keeps magnitudes far below the cap, so this arm only
    // guards a future generator change against a BigDecimal crash)
    else if (vs.exists(v => math.abs(v) >= 9.0e11)) vs.sum
    else vs.map(dec(_, 6)).sum.toDouble
  }

  /** Prometheus's min/max skip NaN unless every sample is NaN. */
  private def promMin(vs: Seq[Double]): Double = {
    val f = vs.filterNot(_.isNaN)
    if (f.isEmpty) Double.NaN else f.min
  }
  private def promMax(vs: Seq[Double]): Double = {
    val f = vs.filterNot(_.isNaN)
    if (f.isEmpty) Double.NaN else f.max
  }

  private object Ref {
    /** The windows a range-fn sample (or delta) lands in: its tumbling
      * window of the range's own grid, or — sliding — every step-grid
      * window whose `[w, w + R)` lookback holds it (the m33 assignment).
      */
    private def winsOf(ts: Long, r: Long, mode: Mode): Seq[Long] = mode match {
      case Grid(false) => Seq(win(ts, r))
      case Grid(true) if r == Step => Seq(win(ts, r))
      case Grid(true) => (0L until r / Step).map(j => win(ts, Step) - j * Step)
      // instant: the one window (t - r, t], or nowhere
      case InstantMode(t, _, _) => if (ts > t - r && ts <= t) Seq(t) else Nil
      case m: PointMode => sys.error(s"PointMode evaluates per point: $m")
    }

    def instant(ss: Seq[Sample], mode: Mode): RVec = mode match {
      case _: Grid =>
        ss.groupBy(s => (s.name, s.labels, win(s.ts, Step))).map { case (k, g) =>
          k -> g.maxBy(s => (s.ts, s.id)).value
        }
      case m: PointMode => sys.error(s"PointMode evaluates per point: $m")
      case InstantMode(t, lb, _) =>
        // latest lookback sample per series, NaN-latest = stale = absent
        ss.filter(s => s.ts > t - lb && s.ts <= t)
          .groupBy(s => (s.name, s.labels))
          .flatMap { case ((n, l), g) =>
            val v = g.maxBy(s => (s.ts, s.id)).value
            if (v.isNaN) None else Some((n, l, t) -> v)
          }
    }

    def increase(ss: Seq[Sample], r: Long, asRate: Boolean, mode: Mode): RVec = {
      mode match {
        case InstantMode(t, _, true) =>
          return increaseExtrapolated(ss, r, asRate, t)
        case _ =>
      }
      // instant evaluation is window-INTERIOR: deltas among the samples
      // of (t - r, t] only (the compiled path's documented model)
      val base = mode match {
        case InstantMode(t, _, _) => ss.filter(s => s.ts > t - r && s.ts <= t)
        case _ => ss
      }
      base.groupBy(s => (s.name, s.labels)).toSeq.flatMap { case ((n, l), g) =>
        val sorted = g.sortBy(s => (s.ts, s.id))
        val incs = sorted.zipWithIndex.flatMap { case (s, i) =>
          val inc =
            if (i == 0) 0.0
            else {
              val d = s.value - sorted(i - 1).value
              if (d < 0) s.value else d
            }
          winsOf(s.ts, r, mode).map(w => (w, inc))
        }
        incs.groupBy(_._1).map { case (w, is) =>
          val total = decSumNF(is.map(_._2))
          (n, l, w) -> (if (asRate) total / r.toDouble else total)
        }
      }.toMap
    }

    /** Go's `extrapolatedRate` (promql/functions.go) from scratch, in
      * the engine's documented operation order: the interior delta sum
      * IS Go's resultFloat, the counter zero-floor clamp runs BEFORE
      * the average-interval threshold, sub-2-sample windows emit
      * nothing, and every step is one IEEE double op.
      */
    private def increaseExtrapolated(
        ss: Seq[Sample], r: Long, asRate: Boolean, t: Long): RVec =
      ss.filter(s => s.ts > t - r && s.ts <= t)
        .groupBy(s => (s.name, s.labels)).toSeq.flatMap { case ((nm, l), g) =>
          val sorted = g.sortBy(s => (s.ts, s.id))
          if (sorted.size < 2) None
          else {
            val incs = sorted.zipWithIndex.map { case (s, i) =>
              if (i == 0) 0.0
              else {
                val d = s.value - sorted(i - 1).value
                if (d < 0) s.value else d
              }
            }
            val inc = decSumNF(incs)
            val fst = sorted.head
            val lst = sorted.last
            val sampled = (lst.ts - fst.ts).toDouble
            val avgIv = sampled / (sorted.size - 1).toDouble
            val thresh = avgIv * 1.1
            val d0Start = (fst.ts - (t - r)).toDouble
            val dZero = sampled * (fst.value / inc)
            // NaN predicates are false, like the engine's codegen'd when()
            val dStartZ =
              if (inc > 0 && fst.value >= 0 && dZero < d0Start) dZero
              else d0Start
            val dStart = if (dStartZ >= thresh) avgIv / 2 else dStartZ
            val d0End = (t - lst.ts).toDouble
            val dEnd = if (d0End >= thresh) avgIv / 2 else d0End
            val v = inc * ((sampled + dStart + dEnd) / sampled)
            Some((nm, l, t) -> (if (asRate) v / r.toDouble else v))
          }
        }.toMap

    def overTime(ss: Seq[Sample], r: Long, fn: String, mode: Mode): RVec =
      ss.flatMap(s => winsOf(s.ts, r, mode).map(w => (s, w)))
        .groupBy { case (s, w) => (s.name, s.labels, w) }
        .map { case (k, g0) =>
          val g = g0.map(_._1)
          val vals = g.map(_.value)
          val v = fn match {
            case "sum_over_time" => decSumNF(vals)
            case "min_over_time" => promMin(vals)
            case "max_over_time" => promMax(vals)
            case "count_over_time" => g.size.toDouble
            case "avg_over_time" => decSumNF(vals) / g.size
            case "last_over_time" => g.maxBy(s => (s.ts, s.id)).value
            // ts_of_*: Prometheus's `>= || isNaN` update loop — any
            // non-NaN sample beats every NaN one, value ties take the
            // LATEST timestamp, an all-NaN window its latest sample
            case "ts_of_last_over_time" => g.map(_.ts).max.toDouble
            case "ts_of_max_over_time" =>
              val nn = g.filterNot(_.value.isNaN)
              if (nn.isEmpty) g.map(_.ts).max.toDouble
              else {
                val mx = nn.map(_.value).max
                nn.filter(_.value == mx).map(_.ts).max.toDouble
              }
            case "ts_of_min_over_time" =>
              val nn = g.filterNot(_.value.isNaN)
              if (nn.isEmpty) g.map(_.ts).max.toDouble
              else {
                val mn = nn.map(_.value).min
                nn.filter(_.value == mn).map(_.ts).max.toDouble
              }
          }
          k -> v
        }

    /** Per-window OLS slope under the engine's exact numeric discipline:
      * x centered on the window's min timestamp (exact integers), sums
      * as exact decimal folds cast to double, the slope algebra in IEEE
      * doubles in the engine's expression order.
      */
    def deriv(ss: Seq[Sample], r: Long, mode: Mode): RVec =
      ss.flatMap(s => winsOf(s.ts, r, mode).map(w => (s, w)))
        .groupBy { case (s, w) => (s.name, s.labels, w) }
        .flatMap { case (k, g0) =>
          val g = g0.map(_._1)
          val t0 = g.map(_.ts).min
          val xs = g.map(s => (s.ts - t0, s.value))
          val n = xs.size
          val nd = n.toDouble
          val sx = xs.map(x => BigDecimal(x._1)).sum.toDouble
          val sxx = xs.map(x => BigDecimal(x._1) * BigDecimal(x._1)).sum.toDouble
          val den = nd * sxx - sx * sx
          if (n < 2 || den == 0.0) None
          else if (g.exists(s => s.value.isNaN || s.value.isInfinite))
            // non-finite samples turn the regression sums into the
            // Inf − Inf fold — NaN, matching the engine's flag arm
            Some(k -> Double.NaN)
          else {
            val sy = xs.map(x => dec(x._2, 6)).sum.toDouble
            val sxy = xs.map(x => BigDecimal(x._1) * dec(x._2, 6)).sum.toDouble
            Some(k -> ((nd * sxy - sx * sy) / den))
          }
        }

    /** Calendar family via java.time — an INDEPENDENT Gregorian
      * implementation against the compiler's modular/epoch-day
      * arithmetic on Spark's DateType.
      */
    def calendar(fn: String, v: RVec): RVec = v.map { case (k, x) =>
      val z = java.time.Instant.ofEpochSecond(x.toLong)
        .atZone(java.time.ZoneOffset.UTC)
      val out = fn match {
        case "minute" => z.getMinute
        case "hour" => z.getHour
        case "day_of_week" => z.getDayOfWeek.getValue % 7
        case "day_of_month" => z.getDayOfMonth
        case "day_of_year" => z.getDayOfYear
        case "days_in_month" => z.toLocalDate.lengthOfMonth
        case "month" => z.getMonthValue
        case "year" => z.getYear
      }
      k -> out.toDouble
    }

    def agg(v: RVec, op: String, by: Option[String]): RVec =
      v.groupBy { case ((_, l, w), _) =>
        (by.fold(Map.empty[String, String])(b => l.filter(_._1 == b)), w)
      }.map { case ((gl, w), g) =>
        val vals = g.values.toSeq
        val out = op match {
          case "sum" => decSumNF(vals)
          case "min" => promMin(vals)
          case "max" => promMax(vals)
          case "count" => vals.size.toDouble
          case "avg" => decSumNF(vals) / vals.size
        }
        ("", gl, w) -> out
      }

    def aggQuantile(v: RVec, q: Double, by: Option[String]): RVec =
      v.groupBy { case ((_, l, w), _) =>
        (by.fold(Map.empty[String, String])(b => l.filter(_._1 == b)), w)
      }.map { case ((gl, w), g) =>
        ("", gl, w) -> percentile4(g.values.toSeq, q)
      }

    def arith(op: String, l: Double, r: Double): Double = op match {
      case "+" => l + r
      case "-" => l - r
      case "*" => l * r
      // JVM double division IS IEEE 754 (x/±0 = ±Inf by both signs,
      // 0/0 = NaN) — exactly Go's, no special-casing needed
      case "/" => l / r
      case "%" => if (r == 0.0) Double.NaN else l % r
      case "atan2" => math.atan2(l, r)
    }

    /** Value-mapping trig functions — same java.lang.Math calls the
      * compiled plan's codegen emits, so equality is bit-exact. The
      * inverse hyperbolics are the FDLIBM algorithms spelled in plain
      * Scala doubles (the spec here IS the algorithm — Go-exact range
      * reduction), checking the compiler's Column translation of the
      * same branch structure bit-for-bit.
      */
    val trigFns: Map[String, Double => Double] = {
      val tiny = java.lang.Math.scalb(1.0, -28)
      val huge = java.lang.Math.scalb(1.0, 28)
      val ln2 = 0.6931471805599453
      // Spark's Log/Log1p expressions call StrictMath (platform-pinned
      // fdlibm), while scala's math.log is the Math.log INTRINSIC — they
      // differ by 1 ulp on real inputs (found by fuzz seed 777000:
      // asinh(-43.88)); the reference must mirror the engine's call
      def slog(x: Double): Double = StrictMath.log(x)
      def slog1p(x: Double): Double = StrictMath.log1p(x)
      def asinh(v: Double): Double =
        if (v.isNaN) Double.NaN
        else if (v == 0.0) v
        else {
          val a = math.abs(v)
          val m =
            if (a < tiny) a
            else if (a > huge) slog(a) + ln2
            else if (a > 2.0) slog(2.0 * a + 1.0 / (a + math.sqrt(a * a + 1.0)))
            else slog1p(a + a * a / (1.0 + math.sqrt(1.0 + a * a)))
          if (v < 0) -m else m
        }
      def acosh(v: Double): Double =
        if (v.isNaN || v < 1) Double.NaN
        else if (v >= huge) slog(v) + ln2
        else if (v > 2.0) slog(2.0 * v - 1.0 / (v + math.sqrt(v * v - 1.0)))
        else { val t = v - 1.0; slog1p(t + math.sqrt(2.0 * t + t * t)) }
      def atanh(v: Double): Double =
        if (v.isNaN || math.abs(v) > 1) Double.NaN
        else if (v == 1.0) Double.PositiveInfinity
        else if (v == -1.0) Double.NegativeInfinity
        else if (v == 0.0) v
        else {
          val a = math.abs(v)
          val m =
            if (a < tiny) a
            else if (a > 0.5) 0.5 * slog1p((a + a) / (1.0 - a))
            else 0.5 * slog1p((a + a) + (a + a) * a / (1.0 - a))
          if (v < 0) -m else m
        }
      Map(
        "sin" -> math.sin, "cos" -> math.cos, "atan" -> math.atan,
        "tanh" -> math.tanh, "deg" -> math.toDegrees, "rad" -> math.toRadians,
        "asinh" -> asinh, "acosh" -> acosh, "atanh" -> atanh)
    }

    /** Spark's exact-percentile interpolation (sorted values, position
      * φ·(n−1), `(hi−pos)·lower + (pos−lo)·higher` in that order) under
      * the engine's 4-dp portability round, with Prometheus's
      * out-of-range-φ convention — the `promPercentile` contract.
      */
    def percentile4(vals: Seq[Double], q: Double): Double =
      if (q.isNaN) Double.NaN
      else if (q < 0) Double.NegativeInfinity
      else if (q > 1) Double.PositiveInfinity
      else {
        val sorted = vals.sorted
        val pos = q * (sorted.size - 1)
        val lo = math.floor(pos).toInt
        val hi = math.ceil(pos).toInt
        // Spark's Percentile skips interpolation when the two keys are
        // equal (duplicate values, incl. boxed-NaN equality) — the
        // ulp-identity matters here
        val raw =
          if (hi == lo || sorted(lo) == sorted(hi) ||
              (sorted(lo).isNaN && sorted(hi).isNaN)) sorted(lo)
          else (hi - pos) * sorted(lo) + (pos - lo) * sorted(hi)
        // Spark's round() passes non-finite doubles through; BigDecimal
        // would throw on them
        if (raw.isNaN || raw.isInfinite) raw
        else BigDecimal.decimal(raw, MathContext.UNLIMITED)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }

    def cmp(op: String, l: Double, r: Double): Boolean = op match {
      case ">" => l > r
      case "<" => l < r
      case ">=" => l >= r
      case "<=" => l <= r
      case "==" => l == r
      case "!=" => l != r
    }

    /** The engine raises on PromQL's many-to-many; the reference mirrors
      * the contract by throwing when either side holds several elements
      * per (labels, window) match key.
      */
    final class ManyToMany extends RuntimeException("many-to-many")

    /** A CONSUMED per-label info conflict — the engine's raise. */
    final class InfoConflict extends RuntimeException("info-conflict")

    /** `info(v[, {sel}])`: each v row gains the merged data labels of
      * the `target_info` series sharing its (instance, job) identity in
      * the same window — per-label merge across matching series, v's
      * own labels winning, a label with two distinct values raising
      * ONLY when a v row consumes the group, data matchers restricting
      * both the considered series and the copied label names. The
      * from-scratch spelling of the compiled join.
      */
    def infoJoin(
        v: RVec, ss: Seq[Sample], mode: Mode,
        dataMs: Seq[LabelMatcher]): RVec = {
      def mOk(m: LabelMatcher, l: Labels): Boolean = {
        val value = l.get(m.label)
        m.op match {
          case MatchOp.Eq => value.contains(m.value)
          case MatchOp.Neq => !value.contains(m.value)
          case MatchOp.Re => value.exists(_.matches(m.value))
          case MatchOp.NotRe => !value.exists(_.matches(m.value))
        }
      }
      val ident = Set("instance", "job")
      val copyKeys = dataMs.map(_.label).toSet
      def copiedOf(l: Labels): Labels = {
        val base = l.view.filterKeys(!ident(_)).toMap
        if (dataMs.isEmpty) base
        else base.view.filterKeys(copyKeys).toMap
      }
      val inf = instant(
        ss.filter(s => s.name == "target_info" && dataMs.forall(mOk(_, s.labels))),
        mode)
      def ikeyOf(l: Labels): (String, String) =
        (l.getOrElse("instance", ""), l.getOrElse("job", ""))
      val groups: Map[((String, String), Long), Seq[Labels]] =
        inf.toSeq.groupBy { case ((_, l, w), _) => (ikeyOf(l), w) }
          .view.mapValues(_.map { case ((_, l, _), _) => copiedOf(l) }).toMap
      v.map { case ((n, l, w), value) =>
        groups.get((ikeyOf(l), w)) match {
          case None => ((n, l, w), value)
          case Some(maps) =>
            val merged = maps.flatten.groupBy(_._1).map { case (k, kvs) =>
              val vs = kvs.map(_._2).distinct
              if (vs.size > 1) throw new InfoConflict
              k -> vs.head
            }
            ((n, l ++ (merged -- l.keys), w), value)
        }
      }
    }

    /** One-to-one vector binary on the full label set per (labels, win).
      * Arithmetic and bool comparisons drop the name; comparisons without
      * bool keep the left row intact.
      */
    def binary(op: String, boolMod: Boolean, l: RVec, r: RVec): RVec = {
      def uniq(v: RVec): Map[(Labels, Long), Double] = {
        val g = v.groupBy { case ((_, lb, w), _) => (lb, w) }
        if (g.exists(_._2.size > 1)) throw new ManyToMany
        g.map { case (k, m) => k -> m.head._2 }
      }
      val rByKey = uniq(r)
      uniq(l) // enforce the contract on the left side too
      l.flatMap { case ((n, lb, w), lv) =>
        rByKey.get((lb, w)).flatMap { rv =>
          if (Set(">", "<", ">=", "<=", "==", "!=")(op)) {
            if (boolMod) Some(("", lb, w) -> (if (cmp(op, lv, rv)) 1.0 else 0.0))
            else if (cmp(op, lv, rv)) Some((n, lb, w) -> lv)
            else None
          } else Some(("", lb, w) -> arith(op, lv, rv))
        }
      }
    }

    def setOp(op: String, l: RVec, r: RVec): RVec = {
      val rKeys = r.keySet.map { case ((_, lb, w)) => (lb, w) }
      val lKeys = l.keySet.map { case ((_, lb, w)) => (lb, w) }
      op match {
        case "and" => l.filter { case ((_, lb, w), _) => rKeys((lb, w)) }
        case "unless" => l.filterNot { case ((_, lb, w), _) => rKeys((lb, w)) }
        case "or" => l ++ r.filterNot { case ((_, lb, w), _) => lKeys((lb, w)) }
      }
    }

    def vecScalar(v: RVec, s: Double, op: String, vecLeft: Boolean, boolMod: Boolean): RVec =
      v.flatMap { case (k, x) =>
        val (l, r) = if (vecLeft) (x, s) else (s, x)
        if (Set(">", "<", ">=", "<=", "==", "!=")(op)) {
          if (boolMod) Some(k -> (if (cmp(op, l, r)) 1.0 else 0.0))
          else if (cmp(op, l, r)) Some(k -> x)
          else None
        } else Some(k -> arith(op, l, r))
      }

    /** The quoted-name shorthand (`{"b.total"}`) re-parses as a lone
      * `__name__` Eq matcher; fold it back into the name slot so the
      * selector cases below stay on one spelling (the compiled path
      * treats the two identically — r16, once the generator started
      * drawing dotted names).
      */
    def normName(e: PromExpr): PromExpr = e match {
      case VectorSelector(None, ms, off, at)
          if ms.count(m => m.label == "__name__" && m.op == MatchOp.Eq) == 1 =>
        val (n, rest) =
          ms.partition(m => m.label == "__name__" && m.op == MatchOp.Eq)
        VectorSelector(Some(n.head.value), rest, off, at)
      case s: VectorSelector => s
      case RangeSelector(s, r) =>
        RangeSelector(normName(s).asInstanceOf[VectorSelector], r)
      case Subquery(i, r, st) => Subquery(normName(i), r, st)
      case Call(f, as) => Call(f, as.map(normName))
      case Agg(op, i, p, g) => Agg(op, normName(i), p.map(normName), g)
      case Binary(op, l, r, m, b) =>
        Binary(op, normName(l), normName(r), m, b)
      case Neg(i) => Neg(normName(i))
      case other => other
    }

    def eval(e: PromExpr, ss: Seq[Sample], mode: Mode = Grid(false)): RVec = e match {
      case VectorSelector(Some(n), Nil, 0L, None) => instant(ss.filter(_.name == n), mode)
      case Call("increase", Seq(RangeSelector(VectorSelector(Some(n), Nil, 0L, None), r))) =>
        increase(ss.filter(_.name == n), r, asRate = false, mode)
      case Call("rate", Seq(RangeSelector(VectorSelector(Some(n), Nil, 0L, None), r))) =>
        increase(ss.filter(_.name == n), r, asRate = true, mode)
      case Call("deriv", Seq(RangeSelector(VectorSelector(Some(n), Nil, 0L, None), r))) =>
        deriv(ss.filter(_.name == n), r, mode)
      case Call("quantile_over_time",
          Seq(NumberLit(q), RangeSelector(VectorSelector(Some(n), Nil, 0L, None), r))) =>
        ss.filter(_.name == n)
          .flatMap(s => winsOf(s.ts, r, mode).map(w => (s, w)))
          .groupBy { case (s, w) => (s.name, s.labels, w) }
          .map { case (k, g) => k -> percentile4(g.map(_._1.value), q) }
      case Call("round", Seq(inner)) =>
        eval(inner, ss, mode).map { case (k, v) =>
          k -> (math.floor(v + 0.5) / 1.0)
        }
      case Call("round", Seq(inner, NumberLit(to))) =>
        // the inverse spelling — promql/functions.go's funcRound
        val inv = 1.0 / to
        eval(inner, ss, mode).map { case (k, v) =>
          k -> math.floor(v * inv + 0.5) / inv
        }
      case Call(fn, Seq(RangeSelector(VectorSelector(Some(n), Nil, 0L, None), r))) =>
        overTime(ss.filter(_.name == n), r, fn, mode)
      case Call(fn, Seq(inner)) if calFns.contains(fn) =>
        calendar(fn, eval(inner, ss, mode))
      case Call(fn, Seq(inner)) if trigFns.contains(fn) =>
        eval(inner, ss, mode).map { case (k, v) => k -> trigFns(fn)(v) }
      case Agg(op, inner, None, g) =>
        val by = g match {
          case AggGroup.All => None
          case AggGroup.By(Seq(l)) => Some(l)
          case other => sys.error(s"generator produced $other")
        }
        agg(eval(inner, ss, mode), op, by)
      case Agg("quantile", inner, Some(NumberLit(q)), g) =>
        val by = g match {
          case AggGroup.All => None
          case AggGroup.By(Seq(l)) => Some(l)
          case other => sys.error(s"generator produced $other")
        }
        aggQuantile(eval(inner, ss, mode), q, by)
      case Call("info", Seq(inner)) =>
        infoJoin(eval(inner, ss, mode), ss, mode, Nil)
      case Call("info", Seq(inner, VectorSelector(None, ms, 0L, None))) =>
        infoJoin(eval(inner, ss, mode), ss, mode, ms)
      case Neg(inner) => eval(inner, ss, mode).map { case (k, v) => k -> (-v) }
      case Binary(op, l, NumberLit(s), None, b) =>
        vecScalar(eval(l, ss, mode), s, op, vecLeft = true, b)
      case Binary(op, NumberLit(s), r, None, b) =>
        vecScalar(eval(r, ss, mode), s, op, vecLeft = false, b)
      case Binary(op, l, r, None, b) if Set("and", "or", "unless")(op) =>
        setOp(op, eval(l, ss, mode), eval(r, ss, mode))
      case Binary(op, l, r, None, b) =>
        binary(op, b, eval(l, ss, mode), eval(r, ss, mode))
      case other => sys.error(s"generator produced unsupported $other")
    }
  }

  // ---- the generator + harness ----

  // extended local bug-hunts override the pinned defaults:
  //   GRAFT_FUZZ_SEED=... GRAFT_FUZZ_ITERS=300 sbt "testOnly *PromDiffFuzzSpec"
  // (CI/driver runs stay deterministic at the committed seeds)
  private val fuzzSeed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong)
  private val fuzzIters = sys.env.get("GRAFT_FUZZ_ITERS").map(_.toInt).getOrElse(60)

  test("compiled plans match the independent interpreter on random trees") {
    runFuzz(Grid(false), ranges = Seq(1800L, 3600L, 7200L),
      seed = fuzzSeed.getOrElse(4242L))
  }

  test("sliding compiled plans match the sliding interpreter on random trees") {
    // sliding requires every range to be a step multiple
    runFuzz(Grid(true), ranges = Seq(3600L, 7200L, 10800L),
      seed = fuzzSeed.map(_ + 1).getOrElse(77L))
  }

  test("instant compiled plans match the instant interpreter on random trees") {
    // t sits inside the planted 4h span, deliberately OFF the grid
    // (instant evaluation has no quantization to hide behind); the
    // 1800s lookback covers the last few samples of every series
    runFuzz(InstantMode(1704067200L + 13500L, 1800L),
      ranges = Seq(1800L, 3600L, 7200L),
      seed = fuzzSeed.map(_ + 2).getOrElse(1212L))
  }

  test("EXTRAPOLATED instant plans match the Go-exact interpreter arm") {
    // same harness, extrapolate=true: every drawn increase/rate runs
    // Go's extrapolatedRate on both sides — branch agreement (zero
    // clamp, threshold halving, sub-2-sample emptiness) bit-for-bit
    runFuzz(InstantMode(1704067200L + 13500L, 1800L, xp = true),
      ranges = Seq(1800L, 3600L, 7200L),
      seed = fuzzSeed.map(_ + 3).getOrElse(9090L))
  }

  test("point-grid compiled plans match the per-point interpreter") {
    runFuzz(PointMode(1704067200L + 5400L, 1704067200L + 12600L, 1800L, 1800L),
      ranges = Seq(1800L, 3600L, 7200L),
      seed = fuzzSeed.map(_ + 4).getOrElse(3434L))
  }

  test("EXTRAPOLATED point-grid plans match the per-point interpreter") {
    runFuzz(PointMode(1704067200L + 5400L, 1704067200L + 12600L, 1800L, 1800L,
      xp = true),
      ranges = Seq(1800L, 3600L, 7200L),
      seed = fuzzSeed.map(_ + 5).getOrElse(5656L))
  }

  private def runFuzz(mode: Mode, ranges: Seq[Long], seed: Long): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // one classic name, one DOTTED (Prometheus 3.x UTF-8): every random
    // tree that draws the second metric round-trips the quoted-name form
    // through the printer → parser → compiler in every mode leg (r16)
    val names = Seq("a_total", "b.total")
    val users = Seq("u1", "u2", "u3")
    val base = 1704067200L
    // planted stream: 2 metrics × 3 series × 24 samples over 4 hours,
    // 2-dp values, zero-padded ids so string and tuple orderings agree;
    // each user rides one (instance, job) identity so info() joins are
    // meaningful on every mode's windows
    val vSamples = for {
      n <- names; u <- users; i <- 0 until 24
    } yield Sample(n,
      Map("user" -> u, "instance" -> u.replace("u", "i"), "job" -> "api"),
      base + i * 600L + rnd.nextInt(300),
      f"id${i}%03d",
      rnd.nextInt(10000) / 100.0)
    // the info side, every 1800 s so every instant/point lookback and
    // every grid window sees a row: i1 carries TWO series with DISJOINT
    // data labels (cluster + env — the merge case), i2 one (cluster),
    // i3 under job=batch carries a CONFLICT (two cluster values) that
    // no v sample consumes — the consumed-only raise, differentially
    val infoSamples = for {
      (ls, tag) <- Seq(
        (Map("instance" -> "i1", "job" -> "api", "cluster" -> "us"), "a"),
        (Map("instance" -> "i1", "job" -> "api", "env" -> "prod"), "b"),
        (Map("instance" -> "i2", "job" -> "api", "cluster" -> "eu"), "c"),
        (Map("instance" -> "i3", "job" -> "batch", "cluster" -> "x1"), "d"),
        (Map("instance" -> "i3", "job" -> "batch", "cluster" -> "x2"), "e"))
      k <- 0 until 8
    } yield Sample("target_info", ls, base + k * 1800L + 50L,
      f"inf$tag%s${k}%03d", 1.0)
    val samples = vSamples ++ infoSamples
    val metrics = samples.map(s =>
        ("app", s.name, s.labels, s.ts, s.id, s.value))
      .toDF("component", "name", "tags", "timestamp", "id", "value")

    val overTimeFns = Seq("sum_over_time", "min_over_time", "max_over_time",
      "count_over_time", "avg_over_time", "last_over_time",
      "ts_of_max_over_time", "ts_of_min_over_time", "ts_of_last_over_time")

    // out-of-range φ makes ±Inf/NaN leaf values — fine everywhere
    // except under the calendar family, which draws genFiniteLeaf
    def genLeaf(): PromExpr = rnd.nextInt(5) match {
      case 4 =>
        val phis = Seq(0.25, 0.5, 0.9, -1.0, 1.5, Double.NaN)
        Call("quantile_over_time",
          Seq(NumberLit(phis(rnd.nextInt(phis.length))),
            RangeSelector(VectorSelector(Some(names(rnd.nextInt(2)))),
              ranges(rnd.nextInt(3)))))
      case n => genFiniteLeaf(n)
    }

    def genFiniteLeaf(n: Int): PromExpr = n match {
      case 0 => VectorSelector(Some(names(rnd.nextInt(2))))
      case 1 => Call(if (rnd.nextBoolean()) "increase" else "rate",
        Seq(RangeSelector(VectorSelector(Some(names(rnd.nextInt(2)))),
          ranges(rnd.nextInt(3)))))
      case 2 => Call(overTimeFns(rnd.nextInt(overTimeFns.length)),
        Seq(RangeSelector(VectorSelector(Some(names(rnd.nextInt(2)))),
          ranges(rnd.nextInt(3)))))
      case 3 => Call("deriv",
        Seq(RangeSelector(VectorSelector(Some(names(rnd.nextInt(2)))),
          ranges(rnd.nextInt(3)))))
    }

    def gen(depth: Int): PromExpr =
      if (depth == 0) genLeaf()
      else rnd.nextInt(8) match {
        case 0 => genLeaf()
        case 7 =>
          // info(): default selector, the copied-label restriction, and
          // an Eq restriction — joined against the planted target_info
          // families (disjoint-label merge on i1, the unconsumed i3
          // conflict exercising the consumed-only raise differentially)
          rnd.nextInt(3) match {
            case 0 => Call("info", Seq(gen(depth - 1)))
            case 1 => Call("info", Seq(gen(depth - 1),
              VectorSelector(None, Seq(LabelMatcher("cluster", MatchOp.Re, ".+")))))
            case _ => Call("info", Seq(gen(depth - 1),
              VectorSelector(None, Seq(LabelMatcher("cluster", MatchOp.Eq, "us")))))
          }
        case 6 =>
          // value-mapping trig over any subtree (NaN/Inf inputs ride
          // through from division subtrees — differential on both
          // sides); the inverse hyperbolics exercise the FDLIBM branch
          // structure (gauge-scale values take the log(2x)/log+ln2
          // arms, tanh-compressed ones the log1p arms, out-of-domain
          // ones the NaN edges), and round's non-dyadic grids pin the
          // inverse spelling through the print-parse round trip too
          rnd.nextInt(3) match {
            case 0 =>
              val pool = Seq("sin", "cos", "atan", "tanh", "deg", "rad")
              Call(pool(rnd.nextInt(pool.length)), Seq(gen(depth - 1)))
            case 1 =>
              val pool = Seq("asinh", "acosh", "atanh")
              val inner =
                if (rnd.nextBoolean()) gen(depth - 1)
                // tanh compresses into atanh's open domain / the
                // small-argument log1p arms
                else Call("tanh", Seq(gen(depth - 1)))
              Call(pool(rnd.nextInt(pool.length)), Seq(inner))
            case _ =>
              val tos = Seq(0.1, 0.001, 0.5, 2.0, 7.0)
              if (rnd.nextBoolean()) Call("round", Seq(gen(depth - 1)))
              else Call("round",
                Seq(gen(depth - 1), NumberLit(tos(rnd.nextInt(tos.length)))))
          }
        case 5 =>
          // calendar fns wrap FINITE leaves only (no division, no
          // out-of-range φ), so both sides' epoch-second casts agree
          Call(calFns(rnd.nextInt(calFns.length)), Seq(genFiniteLeaf(rnd.nextInt(4))))
        case 1 =>
          val g = if (rnd.nextBoolean()) AggGroup.All else AggGroup.By(Seq("user"))
          if (rnd.nextInt(4) == 0) {
            // quantile with in- AND out-of-range φ: the out-of-range
            // constants (±Inf/NaN per present group) and the exact
            // interpolated percentile under the 4-dp round, both
            // through the print-parse round trip
            val phis = Seq(0.25, 0.5, 0.9, -1.0, 1.5, Double.NaN)
            Agg("quantile", gen(depth - 1),
              Some(NumberLit(phis(rnd.nextInt(phis.length)))), g)
          } else
            Agg(Seq("sum", "min", "max", "count", "avg")(rnd.nextInt(5)), gen(depth - 1), None, g)
        case 2 => Neg(gen(depth - 1))
        case 3 =>
          val op = Seq("+", "-", "*", "/", "%", "atan2")(rnd.nextInt(6))
          // scalar 0 is reachable (p = 1/20): x/0 and x%0 make NaN/Inf
          // real inputs, so downstream comparisons exercise the IEEE
          // NaN branch differentially (round 11)
          if (rnd.nextBoolean()) Binary(op, gen(depth - 1), NumberLit(rnd.nextInt(20).toDouble))
          else Binary(op, gen(depth - 1), gen(depth - 1))
        case 4 =>
          val cmpOps = Seq(">", "<", ">=", "<=", "==", "!=")
          val setOpsSeq = Seq("and", "or", "unless")
          if (rnd.nextBoolean())
            Binary(cmpOps(rnd.nextInt(cmpOps.length)), gen(depth - 1),
              NumberLit(rnd.nextInt(100).toDouble), None, boolMod = rnd.nextBoolean())
          else Binary(setOpsSeq(rnd.nextInt(3)), gen(depth - 1), gen(depth - 1))
      }

    def msgHas(e: Throwable, needle: String): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .exists(t => Option(t.getMessage).exists(_.contains(needle)))
    def isM2m(e: Throwable): Boolean = msgHas(e, "many-to-many")
    def isInfoConflict(e: Throwable): Boolean =
      msgHas(e, "conflicting data labels")

    var nonEmpty = 0
    var raises = 0
    for (iter <- 0 until fuzzIters) {
      val ast = gen(2)
      val query = PromQlPrinter.print(ast)
      val got: Either[String, Map[(String, Map[String, String], Long), Double]] =
        try
          Right((mode match {
            case Grid(true) => PromQlCompiler.compileSlidingVector(query, metrics, Step)
            case Grid(false) => PromQlCompiler.compileVector(query, metrics, Step)
            case InstantMode(t, lb, xp) =>
              PromQlCompiler.compileInstantVector(query, metrics, t, lb, Step,
                extrapolate = xp)
            case PointMode(s0, e0, st, lb, xp) =>
              PromQlCompiler.compileRangeVector(query, metrics, s0, e0, st, lb,
                Step, extrapolate = xp)
          })
            .collect()
            .map(r => (r.getAs[String]("name"), r.getAs[Map[String, String]]("labels"),
              r.getAs[Long]("win_start")) -> r.getAs[Double]("value"))
            .toMap)
        catch {
          case e: Throwable if isM2m(e) => Left("many-to-many")
          case e: Throwable if isInfoConflict(e) => Left("info-conflict")
        }
      val want: Either[String, RVec] =
        try Right(mode match {
          // the reference decomposes a point grid into per-point instants
          case PointMode(s0, e0, st, lb, xp) =>
            Iterator.iterate(s0)(_ + st).takeWhile(_ <= e0)
              .map(p => Ref.eval(Ref.normName(PromQlParser.parse(query)),
                samples, InstantMode(p, lb, xp)))
              .foldLeft(Map.empty: RVec)(_ ++ _)
          case m => Ref.eval(Ref.normName(PromQlParser.parse(query)), samples, m)
        })
        catch {
          case _: Ref.ManyToMany => Left("many-to-many")
          case _: Ref.InfoConflict => Left("info-conflict")
        }
      (got, want) match {
        case (Left(_), Left(_)) => raises += 1 // both enforce the contract
        case (Right(g), Right(w)) =>
          val eq = g.keySet == w.keySet && g.forall { case (k, v) =>
            (v.isNaN && w(k).isNaN) || v == w(k)
          }
          assert(eq, s"iter $iter diverged on: $query\n  compiled=${g.toSeq.sortBy(_._1.toString).take(6)}\n  reference=${w.toSeq.sortBy(_._1.toString).take(6)}")
          if (g.nonEmpty) nonEmpty += 1
        case (g, w) =>
          fail(s"iter $iter: cardinality contract diverged on: $query " +
            s"(compiled=${g.left.toOption.getOrElse("rows")}, " +
            s"reference=${w.left.toOption.getOrElse("rows")})")
      }
    }
    assert(nonEmpty > 25, s"only $nonEmpty non-empty results — generator too degenerate")
  }
}
