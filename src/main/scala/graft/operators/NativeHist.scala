package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Prometheus NATIVE (exponential / sparse) histograms — the modern
  * histogram type classic `le`-bucket histograms (m11) are being replaced
  * by: bucket k covers `(base^(k-1), base^k]` with `base = 2^(2^-schema)`,
  * so resolution is relative everywhere on the axis and only OCCUPIED
  * buckets are stored (sparse). References: the Prometheus native
  * histogram design and OpenTelemetry's exponential histogram — both
  * public specs of the same base-2 bucketing.
  *
  * Determinism is the engine discipline: the bucket index is computed
  * EXACTLY from the IEEE exponent/mantissa
  * ([[org.apache.spark.sql.graft.Exp2Bucket]] — no runtime logarithm, so
  * a value sitting exactly on a power of two can never flip buckets
  * between engines), buckets render as a SORTED (idx, cnt) array, and
  * every count is an exact long.
  *
  * Input domain: observations must be FINITE doubles (the exact-long
  * count / exact-decimal sum representation cannot carry NaN/±Inf, and
  * a histogram of non-finite observations is semantically void — Go's
  * client would turn `sum` into NaN and bucket nothing). The metric
  * ingest can surface non-finite values (see
  * [[graft.functions.IeeeLanes]]); filter them ahead of the histogram
  * build (`!isnan(v) && abs(v) != Inf`) — the aggregation lanes
  * elsewhere carry them, histograms refuse them by contract.
  *
  * Scale shape: ONE scan into (group, window, bucket) counts —
  * map-side-combinable, the shuffled relation is groups × windows ×
  * occupied-buckets; the pack into the sparse array is a second
  * aggregation over that already-tiny relation. Merging rollup tiers
  * ([[merge]]) touches only histogram rows, never raw samples — the
  * m19 maintenance argument. The quantile ([[quantile]]) is a row-local
  * fold over the sorted bucket array (occupied-bucket-bounded), fully
  * codegen.
  */
object NativeHist {

  private def winCol(widthSec: Long): Column =
    (col("timestamp") - pmod(col("timestamp"), lit(widthSec))).cast("long")

  /** Build per-(group, window) native histograms from raw samples.
    * Non-positive values land in `zero_count` (the zero bucket; the
    * stream carries no negatives — a negative-bucket set would mirror
    * the positive one). Output: group cols, `win_start`, `schema`,
    * `zero_count`, `n_samples`, `buckets: array<struct<idx,cnt>>`
    * sorted by idx.
    */
  def nativeHistogram(
      metrics: DataFrame,
      schema: Int = 0,
      widthSec: Long = 3600,
      by: Seq[String] = Seq("component", "name")): DataFrame =
    nativeHistogramKeyed(
      metrics.withColumn("win_start", winCol(widthSec)), schema, by)

  /** [[nativeHistogram]] over a PRE-ASSIGNED `win_start` column — the
    * seam sliding evaluation needs: the caller replicates each sample
    * onto every step-grid window whose lookback holds it (the compiler's
    * tile explode) and the histogram build is unchanged from there.
    */
  def nativeHistogramKeyed(
      keyedIn: DataFrame,
      schema: Int = 0,
      by: Seq[String] = Seq("component", "name")): DataFrame = {
    val keyed = keyedIn
      .withColumn("_idx",
        when(col("value") > 0, GraftFunctions.exp2_bucket(col("value"), schema)))
    val keys = by.map(col) :+ col("win_start")
    keyed
      .groupBy(keys :+ col("_idx"): _*)
      .agg(
        count(lit(1)).as("_c"),
        // exact per-bucket pre-sums: the histogram's `sum` field
        // (Prometheus native histograms carry count + sum next to the
        // buckets) folds in order-independent decimals, so merge ==
        // recompute holds for it exactly like the counts
        sum(col("value").cast("decimal(18,2)")).as("_s"))
      .groupBy(keys: _*)
      .agg(
        coalesce(sum(when(col("_idx").isNull, col("_c"))), lit(0L)).as("zero_count"),
        sum(col("_c")).as("n_samples"),
        sum(col("_s")).cast("decimal(28,2)").as("sum"),
        sort_array(collect_list(when(col("_idx").isNotNull,
          struct(col("_idx").as("idx"), col("_c").as("cnt"))))).as("buckets"))
      .withColumn("schema", lit(schema))
  }

  /** The `histogram_count` / `histogram_sum` / `histogram_avg` accessors:
    * count recomputed FROM the sparse fields (zero bucket + Σ bucket
    * counts — provably `n_samples` for a well-formed histogram), sum the
    * exact decimal field as a double, avg their IEEE quotient.
    */
  def accessors(hists: DataFrame): DataFrame = {
    val cnt = col("zero_count") +
      aggregate(col("buckets"), lit(0L), (a, b) => a + b.getField("cnt"))
    hists
      .withColumn("h_count", cnt)
      .withColumn("h_sum", col("sum").cast("double"))
      .withColumn("h_avg", col("h_sum") / col("h_count").cast("double"))
  }

  /** Canonical string rendering of a sparse bucket array
    * ("idx:cnt,idx:cnt", ascending idx) — the oracle-comparable form.
    */
  def bucketsString(buckets: Column): Column =
    array_join(
      transform(buckets, b =>
        concat(b.getField("idx").cast("string"), lit(":"),
          b.getField("cnt").cast("string"))),
      ",")

  /** Merge short-window histograms into `longSec` windows — rollup-tier
    * maintenance over histogram rows only (raw history never re-read;
    * the m19 argument). Counts are exact longs, so merge == recompute
    * bit-for-bit. Assumes a uniform `schema` across inputs (enforced).
    */
  def merge(
      hists: DataFrame,
      longSec: Long,
      by: Seq[String] = Seq("component", "name")): DataFrame = {
    val longWin =
      (col("win_start") - pmod(col("win_start"), lit(longSec))).cast("long").as("win_start")
    val keys = by.map(col) :+ longWin
    val keyNames = by :+ "win_start"
    val zeros = hists
      .groupBy(keys: _*)
      .agg(
        sum(col("zero_count")).as("zero_count"),
        sum(col("n_samples")).as("n_samples"),
        sum(col("sum")).cast("decimal(28,2)").as("sum"),
        min(col("schema")).as("schema"),
        max(col("schema")).as("_smax"))
    val bcounts = hists
      .select(by.map(col) :+ col("win_start") :+ explode(col("buckets")).as("_b"): _*)
      .groupBy(keys: _*)
      .agg(sort_array(collect_list(struct(col("_b.idx").as("idx"), col("_b.cnt")))).as("_raw"))
      // the same idx may arrive from several short windows — re-sum
      .withColumn("buckets",
        transform(
          array_distinct(transform(col("_raw"), b => b.getField("idx"))),
          i => struct(
            i.as("idx"),
            aggregate(
              filter(col("_raw"), b => b.getField("idx") === i),
              lit(0L), (a, b) => a + b.getField("cnt")).as("cnt"))))
      .drop("_raw")
    zeros
      .join(bcounts, keyNames, "left")
      .withColumn("buckets",
        coalesce(col("buckets"),
          array().cast("array<struct<idx:int,cnt:bigint>>")))
      .withColumn("schema",
        when(col("schema") === col("_smax"), col("schema"))
          .otherwise(raise_error(lit("cannot merge native histograms of mixed schemas"))
            .cast("int")))
      .drop("_smax")
  }

  /** The `q`-quantile of each native histogram row — linear interpolation
    * within the covering bucket (Prometheus's rule), 0 when the rank
    * falls in the zero bucket. A row-local fold over the sorted sparse
    * bucket array; `pow(2, k)` on integral exponents is exact, so the
    * bucket bounds are the same doubles in any engine.
    */
  def quantile(hists: DataFrame, q: Double): DataFrame = {
    // Prometheus's histogram_quantile convention for out-of-range φ:
    // φ < 0 → -Inf, φ > 1 → +Inf, NaN → NaN — applied at the API
    // boundary so a bad φ never silently yields null (fold exhausted)
    // or a spurious 0.0 (empty zero bucket)
    if (q.isNaN) return hists.withColumn("q_value", lit(Double.NaN))
    if (q < 0) return hists.withColumn("q_value", lit(Double.NegativeInfinity))
    if (q > 1) return hists.withColumn("q_value", lit(Double.PositiveInfinity))
    val total = (col("zero_count") +
      aggregate(col("buckets"), lit(0L), (a, b) => a + b.getField("cnt"))).cast("double")
    val rank = lit(q) * total
    val div = pow(lit(2.0), col("schema").cast("double"))
    val walk = aggregate(
      col("buckets"),
      struct(col("zero_count").cast("double").as("cum"),
        lit(null).cast("double").as("ans")),
      (acc, b) => {
        val cnt = b.getField("cnt").cast("double")
        val cum2 = acc.getField("cum") + cnt
        val idx = b.getField("idx").cast("double")
        val lo = pow(lit(2.0), (idx - 1) / div)
        val hi = pow(lit(2.0), idx / div)
        struct(
          cum2.as("cum"),
          when(acc.getField("ans").isNotNull, acc.getField("ans"))
            .when(cum2 >= rank,
              lo + (hi - lo) * ((rank - acc.getField("cum")) / cnt))
            .as("ans"))
      })
    hists.withColumn("q_value",
      when(rank <= col("zero_count").cast("double"), lit(0.0))
        .otherwise(walk.getField("ans")))
  }

  /** `histogram_stddev` / `histogram_stdvar` estimators: the variance of
    * the bucket-MIDPOINT distribution (each bucket's count at its
    * arithmetic midpoint, the zero bucket at 0) around the exact mean
    * `sum/count` — computable because the histogram carries the true
    * `sum` field. Determinism: one left fold over the SORTED sparse
    * array (ascending idx, the same order an oracle's ordered list
    * fold replays), every term the fixed IEEE tree
    * `cnt * (mid - mean) * (mid - mean)`. NaN on an empty histogram.
    */
  def spread(hists: DataFrame): DataFrame = {
    val total = (col("zero_count") +
      aggregate(col("buckets"), lit(0L), (a, b) => a + b.getField("cnt"))).cast("double")
    val mean = col("sum").cast("double") / total
    val div = pow(lit(2.0), col("schema").cast("double"))
    val init = col("zero_count").cast("double") * mean * mean
    val acc = aggregate(
      col("buckets"), init,
      (a, b) => {
        val idx = b.getField("idx").cast("double")
        val mid = (pow(lit(2.0), (idx - 1) / div) + pow(lit(2.0), idx / div)) / 2
        val d = mid - mean
        a + b.getField("cnt").cast("double") * d * d
      })
    hists
      .withColumn("h_stdvar",
        when(total === 0.0, lit(Double.NaN)).otherwise(acc / total))
      .withColumn("h_stddev", sqrt(col("h_stdvar")))
  }

  /** `histogram_fraction(lower, upper, h)`: the estimated fraction of
    * observations in `(lower, upper]` — the interpolated cumulative
    * count at each bound (linear within the covering bucket, the same
    * rule [[quantile]] applies), differenced and divided by the total.
    * Zero-bucket observations are counted by a bound ≥ 0, so they
    * contribute to the fraction exactly when the interval spans zero
    * (`lower < 0 ≤ upper`) and cancel otherwise.
    *
    * Determinism shape: each cumulative splits into an EXACT long count
    * (zero bucket + every bucket fully below the bound — integer
    * addition commutes, so any fold order is bit-identical) plus ONE
    * fractional interpolation term from the unique covering bucket (all
    * other fold steps add literal 0.0, which is exact) — so the result
    * is a fixed IEEE expression tree an oracle can reproduce,
    * independent of aggregation order. NaN on an empty histogram.
    */
  def fraction(hists: DataFrame, lower: Double, upper: Double): DataFrame = {
    require(lower <= upper, "histogram fraction needs lower <= upper")
    val total = (col("zero_count") +
      aggregate(col("buckets"), lit(0L), (a, b) => a + b.getField("cnt"))).cast("double")
    val div = pow(lit(2.0), col("schema").cast("double"))
    def boundsOf(b: Column): (Column, Column) = {
      val idx = b.getField("idx").cast("double")
      (pow(lit(2.0), (idx - 1) / div), pow(lit(2.0), idx / div))
    }
    def cumLe(bound: Double): Column =
      if (bound < 0) lit(0.0)
      else {
        val whole = col("zero_count") + aggregate(
          col("buckets"), lit(0L),
          (a, b) => a + when(boundsOf(b)._2 <= lit(bound), b.getField("cnt"))
            .otherwise(lit(0L)))
        val frac = aggregate(
          col("buckets"), lit(0.0),
          (a, b) => {
            val (lo, hi) = boundsOf(b)
            a + when(lo < lit(bound) && hi > lit(bound),
              b.getField("cnt").cast("double") * ((lit(bound) - lo) / (hi - lo)))
              .otherwise(lit(0.0))
          })
        whole.cast("double") + frac
      }
    hists.withColumn("fraction",
      when(total === 0.0, lit(Double.NaN))
        .otherwise((cumLe(upper) - cumLe(lower)) / total))
  }
}
