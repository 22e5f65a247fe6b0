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
    dot / (math.sqrt(na) * math.sqrt(nb))
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

  /** Full MinHash signature in one pass: element i = min over terms of
    * md5Prefix60(i + ":" + term). Identical values to the per-(perm, term)
    * SQL formulation, but one tight JVM loop instead of a k-fold row
    * explosion or interpreted higher-order lambdas.
    */
  def minhashSig(terms: ArrayData, k: Int): Array[Long] = {
    val md = md5Local.get()
    val n = terms.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < k) {
      val prefix = (i.toString + ":").getBytes("UTF-8")
      var t = 0
      while (t < n) {
        md.reset()
        md.update(prefix)
        md.update(terms.getUTF8String(t).getBytes)
        val digest = md.digest()
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        h = (h << 4) | ((digest(7) & 0xf0L) >> 4)
        if (h < sig(i)) sig(i) = h
        t += 1
      }
      i += 1
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
