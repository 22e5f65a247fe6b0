package graft

import org.apache.spark.sql.functions._

import graft.operators.NativeHist

/** Batch pins for the native-histogram accessor family on planted
  * values with known exponential buckets (schema 0: bucket k covers
  * `(2^(k-1), 2^k]`).
  */
class NativeHistSpec extends SparkSuite {

  import spark.implicits._

  // one window (width 3600, all ts < 3600): zero bucket {0, -1},
  // bucket 1 (1, 2]: {1.5, 2.0}, bucket 2 (2, 4]: {3.0},
  // bucket 4 (8, 16]: {12.0}  — total 6
  private lazy val hists = NativeHist.nativeHistogram(
    Seq(
      ("app", "m", 10L, 0.0), ("app", "m", 20L, -1.0),
      ("app", "m", 30L, 1.5), ("app", "m", 40L, 2.0),
      ("app", "m", 50L, 3.0), ("app", "m", 60L, 12.0))
      .toDF("component", "name", "timestamp", "value"),
    schema = 0)

  test("planted values land in the IEEE-exact buckets") {
    val r = hists.select("zero_count", "n_samples", "buckets").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 6L)
    val buckets = r.getSeq[org.apache.spark.sql.Row](2)
      .map(b => (b.getInt(0), b.getLong(1)))
    assert(buckets === Seq((1, 2L), (2, 1L), (4, 1L)))
  }

  test("fraction: exact full counts, single-bucket interpolation, zero-span rule") {
    def frac(lo: Double, hi: Double): Double =
      NativeHist.fraction(hists, lo, hi).select("fraction").head.getDouble(0)
    // everything (zero bucket included only because lower < 0)
    assert(frac(-1.0, 16.0) === 1.0)
    // all positives: the zero bucket cancels out of both cumulatives
    assert(frac(0.0, 16.0) === 4.0 / 6.0)
    // bucket-aligned bounds need no interpolation: (2, 4] holds one
    assert(frac(2.0, 4.0) === 1.0 / 6.0)
    // half of bucket (2, 4] by linear interpolation
    assert(frac(2.0, 3.0) === 0.5 / 6.0)
    // covering-bucket interpolation at the upper bound only:
    // cum(12) = zc + 3 full + (12-8)/(16-8) of bucket 4's single count
    assert(frac(0.0, 12.0) === (3.0 + 0.5) / 6.0)
    // interval additivity on shared expression trees
    assert(math.abs(frac(0.0, 3.0) + frac(3.0, 16.0) - frac(0.0, 16.0)) < 1e-12)
  }

  test("spread: bucket-midpoint variance around the exact mean") {
    val r = NativeHist.spread(hists).select("h_stdvar", "h_stddev").head
    // mean = (0 - 1 + 1.5 + 2 + 3 + 12) / 6; midpoints: b1 -> 1.5 (2x),
    // b2 -> 3, b4 -> 12; zero bucket (2 samples) at 0
    val mean = 17.5 / 6
    val expected = (2 * mean * mean + 2 * (1.5 - mean) * (1.5 - mean) +
      (3 - mean) * (3 - mean) + (12 - mean) * (12 - mean)) / 6
    assert(math.abs(r.getDouble(0) - expected) < 1e-12)
    assert(r.getDouble(1) === math.sqrt(r.getDouble(0)))
  }

  test("out-of-range quantile q maps to -Inf/+Inf/NaN, never null or 0.0") {
    def q(phi: Double): Double =
      NativeHist.quantile(hists, phi).select("q_value").collect().head.getDouble(0)
    assert(q(-0.1).isNegInfinity)
    assert(q(1.5).isPosInfinity)
    assert(q(Double.NaN).isNaN)
    // in-range sanity rides along: the median of the planted set falls
    // in bucket 1's interpolated span
    assert(q(0.5) > 1.0 && q(0.5) <= 2.0)
  }

  test("fraction of an empty histogram is NaN") {
    val empty = NativeHist.nativeHistogram(
      Seq.empty[(String, String, Long, Double)]
        .toDF("component", "name", "timestamp", "value"),
      schema = 0)
    assert(NativeHist.fraction(empty, 0.0, 1.0).count() === 0L)
    // a histogram whose rows exist but hold nothing cannot arise from
    // nativeHistogram (every row counts >= 1 sample); the NaN guard is
    // for merged/filtered relations — exercise it directly
    val zeroRow = Seq(("app", "m", 0L, 0L, 0L))
      .toDF("component", "name", "win_start", "zero_count", "n_samples")
      .withColumn("buckets",
        array().cast("array<struct<idx:int,cnt:bigint>>"))
      .withColumn("schema", lit(0))
    val f = NativeHist.fraction(zeroRow, 0.0, 1.0).select("fraction").head.getDouble(0)
    assert(f.isNaN)
  }
}
