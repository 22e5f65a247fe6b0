package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels

class KernelsSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  test("md5Prefix60 matches the portable SQL form CAST('0x'||substr(md5(s),1,15) AS BIGINT)") {
    // value cross-checked in DuckDB 1.0: md5('abc') = 900150983cd24fb0...,
    // first 15 hex digits = 0x900150983cd24fb = 648541476951500027
    assert(Kernels.md5Prefix60(u("abc")) === 648541476951500027L)
    assert(Kernels.md5Prefix60(u("")) >= 0L)
  }

  test("fingerprint is the (h*31+cp) mod p fold over code points") {
    def naive(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, cp) => (h * 31 + cp) % Kernels.FingerprintMod)
    for (s <- Seq("", "a", "abc", "the quick brown fox", "ünïcödé"))
      assert(Kernels.fingerprint(u(s)) === naive(s), s"for '$s'")
  }

  test("cosine accumulates f32 inputs in f64, index order") {
    val a = ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f))
    val b = ArrayData.toArrayData(Array(-1.0f, 0.5f, 2.0f))
    val dot = 1.0 * -1.0 + 2.0 * 0.5 + 3.0 * 2.0
    val na = math.sqrt(1.0 + 4.0 + 9.0)
    val nb = math.sqrt(1.0 + 0.25 + 4.0)
    assert(Kernels.cosine(a, b) === dot / (na * nb))
  }

  test("minhash signatures merge by element-wise min (map-side combinability)") {
    // sig(A ∪ B) = min(sig(A), sig(B)) per element — the algebraic property
    // that makes the signature a distributive aggregate: partial signatures
    // computed per partition combine losslessly, so a 100 TB corpus never
    // ships raw shingles
    val rnd = new scala.util.Random(7)
    def terms(n: Int) = Array.fill(n)(u("w" + rnd.nextInt(500)))
    (1 to 50).foreach { _ =>
      val a = terms(1 + rnd.nextInt(30))
      val b = terms(1 + rnd.nextInt(30))
      val sa = Kernels.minhashSig(ArrayData.toArrayData(a), 12)
      val sb = Kernels.minhashSig(ArrayData.toArrayData(b), 12)
      val su = Kernels.minhashSig(ArrayData.toArrayData(a ++ b), 12)
      assert(su.toSeq === sa.zip(sb).map { case (x, y) => math.min(x, y) }.toSeq)
    }
  }

  test("simhash is order-insensitive over terms and stable") {
    val t1 = ArrayData.toArrayData(Array(u("spark"), u("flink"), u("duck")))
    val t2 = ArrayData.toArrayData(Array(u("duck"), u("spark"), u("flink")))
    assert(Kernels.simhash(t1) === Kernels.simhash(t2))
    assert(Kernels.simhash(t1) >= 0L && Kernels.simhash(t1) < (1L << 60))
    // single term: fingerprint is exactly the term hash's 60 bits
    val single = ArrayData.toArrayData(Array(u("abc")))
    assert(Kernels.simhash(single) === Kernels.md5Prefix60(u("abc")))
  }

  test("exp2Bucket: exact IEEE bucketing at powers of two and sub-octave schemas") {
    val t0 = Kernels.exp2Boundaries(0)
    // bucket k covers (2^(k-1), 2^k]: the power itself belongs DOWN
    assert(Kernels.exp2Bucket(32.0, 0, t0) === 5)
    assert(Kernels.exp2Bucket(math.nextUp(32.0), 0, t0) === 6)
    assert(Kernels.exp2Bucket(1.0, 0, t0) === 0)
    assert(Kernels.exp2Bucket(0.25, 0, t0) === -2)
    assert(Kernels.exp2Bucket(0.01, 0, t0) === -6)
    assert(Kernels.exp2Bucket(490.02, 0, t0) === 9)
    assert(Kernels.exp2Bucket(0.0, 0, t0) === Int.MinValue)
    assert(Kernels.exp2Bucket(-3.0, 0, t0) === Int.MinValue)
    assert(Kernels.exp2Bucket(Double.NaN, 0, t0) === Int.MinValue)
    assert(Kernels.exp2Bucket(Double.PositiveInfinity, 0, t0) === Int.MinValue)
    // schema 2 (base 2^(1/4)): agrees with ceil(4·log2 v) away from
    // boundaries, where the log formulation is itself safe
    val t2b = Kernels.exp2Boundaries(2)
    for (v <- Seq(1.0, 1.01, 1.19, 1.2, 2.0, 3.0, 5.5, 100.0, 0.3)) {
      val want = math.ceil(4.0 * (math.log(v) / math.log(2.0))).toInt
      assert(Kernels.exp2Bucket(v, 2, t2b) === want, s"v=$v")
    }
    // a value exactly ON a sub-octave boundary belongs to its own bucket
    // (2^2 · 2^(1/4): power-of-two scaling keeps the mantissa exact)
    assert(Kernels.exp2Bucket(t2b(1) * 4.0, 2, t2b) === 2 * 4 + 1)
  }
}
