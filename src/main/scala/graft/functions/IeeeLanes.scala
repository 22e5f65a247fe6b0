package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IEEE non-finite / big-finite handling for the engine's exact-decimal
  * sum lanes.
  *
  * The numeric discipline everywhere in this engine is: sum 2-dp (or
  * 6-dp) inputs as exact decimals, cast to double once at the end —
  * order-independent, engine-portable, hash-stable against the DuckDB
  * oracles. That discipline has two cliffs a production stream can walk
  * off:
  *
  *  - NaN/±Inf values. JSON ingest parses them (Spark's
  *    `allowNonNumericNumbers` accepts `NaN`/`Infinity` tokens by
  *    default, and Prometheus exposition legitimately carries NaN), and
  *    PromQL arithmetic (`x / 0`) produces them. Spark's ANSI decimal
  *    cast FAILS THE WHOLE JOB on the first one; the legacy cast
  *    silently nulls it out of the sum. At 100 TB one poison record
  *    must do neither.
  *  - Large finite values: decimal(18,2) cannot represent |v| ≳ 1e16
  *    and decimal(18,6) caps at ~1e12 — byte counters get there.
  *
  * The fix is one shape, used by every sum lane: the DECIMAL lane sums
  * only finite in-range values; five cheap flag/sidecar aggregates ride
  * the same (map-side-combinable, streaming-legal) aggregation; and the
  * published sum is reconstructed exactly as an IEEE double fold would
  * land — any NaN or both infinities → NaN, one infinity → that
  * infinity, any finite value past the cap → the plain IEEE-double
  * sidecar sum (the arithmetic Prometheus itself runs; only such groups
  * give up summation-order independence), else the exact decimal sum.
  *
  * Min/max/percentile need no guard: Spark's orderings treat NaN as
  * greatest (the same total order DuckDB uses, oracle-consistent) and
  * carry ±Inf natively. The PromQL compiler keeps its own private
  * mirror of these lanes (per-window semantics differ slightly there:
  * Prometheus-exact max NaN-skipping, variance-NaN rules).
  */
object IeeeLanes {

  /** decimal(18,2) lane cap, a full digit of margin under the 1e16
    * representable bound so the cast's half-up rounding cannot push a
    * just-under value over.
    */
  val Cap2dp: Double = 9.0e15

  /** decimal(18,6) lane cap (representable bound ~1e12). */
  val Cap6dp: Double = 9.0e11

  def isFiniteC(v: Column): Column =
    !(isnan(v) || abs(v) === lit(Double.PositiveInfinity))

  /** The exact decimal lane: finite in-range values; non-finite and
    * big values contribute 0 (the flags reconstruct them); null stays
    * null so conditional masks keep their aggregate-skip semantics.
    */
  def decLane(v: Column, cap: Double): Column =
    when(v.isNull, v)
      .when(isFiniteC(v) && abs(v) < lit(cap), v)
      .otherwise(lit(0.0))

  /** The IEEE-double sidecar lane: every finite value; non-finites 0;
    * null stays null.
    */
  def finLane(v: Column): Column =
    when(v.isNull, v).when(isFiniteC(v), v).otherwise(lit(0.0))

  /** The flag + sidecar aggregates for one value lane, name-prefixed so
    * several lanes coexist in one aggregation. All five are algebraic
    * partials: map-side combinable in batch, legal in streaming
    * aggregations.
    */
  def flagAggs(v: Column, p: String, cap: Double): Seq[Column] = Seq(
    max(isnan(v).cast("int")).as(s"_${p}nan"),
    max((v === lit(Double.PositiveInfinity)).cast("int")).as(s"_${p}pi"),
    max((v === lit(Double.NegativeInfinity)).cast("int")).as(s"_${p}ni"),
    max((isFiniteC(v) && abs(v) >= lit(cap)).cast("int")).as(s"_${p}big"),
    sum(finLane(v)).as(s"_${p}dsum"))

  /** The published sum: the IEEE classification over the flags, the
    * sidecar for big groups, the exact decimal sum otherwise.
    */
  def reconstruct(finDecSum: Column, p: String): Column =
    when(col(s"_${p}nan") === 1 ||
        (col(s"_${p}pi") === 1 && col(s"_${p}ni") === 1), lit(Double.NaN))
      .when(col(s"_${p}pi") === 1, lit(Double.PositiveInfinity))
      .when(col(s"_${p}ni") === 1, lit(Double.NegativeInfinity))
      .when(col(s"_${p}big") === 1, col(s"_${p}dsum"))
      .otherwise(finDecSum)

  /** Any value outside the finite regime (NaN or ±Inf) in the group. */
  def anyNonFinite(p: String): Column =
    col(s"_${p}nan") === 1 || col(s"_${p}pi") === 1 || col(s"_${p}ni") === 1

  def isBig(p: String): Column = col(s"_${p}big") === 1

  def flagCols(p: String): Seq[String] =
    Seq("nan", "pi", "ni", "big", "dsum").map(s => s"_${p}$s")

  def dropFlags(df: DataFrame, ps: String*): DataFrame =
    df.drop(ps.flatMap(flagCols): _*)
}
