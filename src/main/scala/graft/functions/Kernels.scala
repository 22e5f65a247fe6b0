package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code. Keeping the
  * hot loop in one static JVM method lets whole-stage codegen emit a single
  * static call (no virtual dispatch, no boxing) while staying identical to
  * the interpreted path. (Scala objects emit static forwarders, so Janino
  * resolves `graft.functions.Kernels.cosine(...)` directly.)
  */
object Kernels {

  /** dot/(|a||b|) accumulated in f64 over f32 inputs, strictly in index
    * order — bit-identical to the DuckDB oracle's `list_reduce` formulation.
    * A zero-norm (all-zero) vector would make this 0/0 = NaN, which Spark
    * orders ABOVE every double in a descending sort — a degenerate
    * embedding would then beat every real neighbor in top-k. Pin it to
    * -1.0 instead: below any true cosine, so degenerate vectors rank last
    * and never pass a similarity threshold.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val normProd = math.sqrt(na) * math.sqrt(nb)
    if (normProd == 0.0) -1.0 else dot / normProd
  }

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(s) as a non-negative long — the portable hash both
    * engines can compute (`CAST('0x' || substr(md5(s),1,15) AS BIGINT)`).
    * The digest instance is thread-local: a fresh JCA lookup per row would
    * dominate the hash itself on hot paths.
    */
  def md5Prefix60(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    // first 15 hex chars = first 7 bytes + high nibble of the 8th
    var h = 0L
    var i = 0
    while (i < 7) {
      h = (h << 8) | (digest(i) & 0xffL)
      i += 1
    }
    (h << 4) | ((digest(7) & 0xf0L) >> 4)
  }

  /** 60-bit SimHash over an array of terms: per bit j, majority vote of
    * (md5Prefix60(term) >> j) & 1 mapped to ±1; bit set iff the vote is
    * strictly positive. Caller is responsible for term de-duplication.
    */
  def simhash(terms: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = terms.numElements()
    var i = 0
    while (i < n) {
      val h = md5Prefix60(terms.getUTF8String(i))
      var j = 0
      while (j < 60) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Mersenne modulus 2^61 - 1 for the MinHash permutation family. */
  val M61: Long = (1L << 61) - 1

  /** Exact (a*b) mod 2^61-1 for 0 ≤ a, b < 2^61, via the 128-bit product:
    * with prod = hi·2^64 + lo and 2^64 ≡ 8 (mod M61),
    * prod ≡ hi·8 + (lo mod M61). All reductions are branch-light adds.
    */
  def mulModM61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // a,b < 2^61 are positive: signed == unsigned
    val lo = a * b                   // low 64 bits, interpret unsigned
    val loMod = {
      val r = (lo & M61) + (lo >>> 61)
      if (r >= M61) r - M61 else r
    }
    val hi8 = {
      val h = hi << 3 // hi < 2^58 so hi*8 < 2^61: no overflow
      if (h >= M61) h - M61 else h
    }
    val r = hi8 + loMod
    if (r >= M61) r - M61 else r
  }

  /** Universal-family permutation hash h_i(x) = (a_i·x + b_i) mod 2^61-1,
    * with (a_i, b_i) derived once from md5 of the permutation index. This is
    * the classic MinHash construction: ONE content hash per term, k cheap
    * affine maps — versus k full md5 computations per term. Portable: DuckDB
    * computes the identical value with HUGEINT arithmetic
    * (`(a_i::HUGEINT * base + b_i) % 2305843009213693951`).
    */
  def permCoeffA(i: Int): Long =
    md5Prefix60(UTF8String.fromString("a:" + i)) | 1L // odd, non-zero
  def permCoeffB(i: Int): Long =
    md5Prefix60(UTF8String.fromString("b:" + i))

  /** Full MinHash signature in one pass: base = md5Prefix60(term) once, then
    * k affine permutation hashes; element i = min over terms.
    */
  def minhashSig(terms: ArrayData, k: Int): Array[Long] = {
    val n = terms.numElements()
    val as = Array.tabulate(k)(permCoeffA)
    val bs = Array.tabulate(k)(permCoeffB)
    val sig = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val base = md5Prefix60(terms.getUTF8String(t))
      var i = 0
      while (i < k) {
        var h = mulModM61(as(i), base) + bs(i)
        if (h >= M61) h -= M61 // bs(i) < 2^60 < M61, so one reduction suffices
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    sig
  }

  /** Modulus of the polynomial rolling fingerprint (prime < 2^50, so
    * `h*31 + cp` can never overflow a long).
    */
  val FingerprintMod: Long = 1000000000000037L

  /** h = fold over code points of (h*31 + cp) mod FingerprintMod. Portable:
    * the oracle expresses the same fold with `list_reduce` over
    * `ord(substr(text,i,1))`.
    */
  def fingerprint(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % FingerprintMod
      i += Character.charCount(cp)
    }
    h
  }
}
