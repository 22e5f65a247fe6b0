package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Direct coverage for the driver-local coarse-quantizer fit behind s3:
  * deterministic for a seed, sane on degenerate inputs, and actually
  * clusters (well-separated blobs recover their means).
  */
class LloydSpec extends AnyFunSuite {

  private def blob(rnd: scala.util.Random, center: Array[Double], n: Int): Seq[Array[Double]] =
    Seq.fill(n)(center.map(c => c + (rnd.nextDouble() - 0.5) * 0.1))

  test("same seed, same sample -> identical centers") {
    val rnd = new scala.util.Random(7)
    val pts = (blob(rnd, Array(0.0, 0.0), 50) ++ blob(rnd, Array(5.0, 5.0), 50)).toArray
    val a = Similarity.lloydFit(pts, k = 4, iters = 8, seed = 42L)
    val b = Similarity.lloydFit(pts, k = 4, iters = 8, seed = 42L)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("k larger than the sample yields one center per point, no crash") {
    val pts = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val centers = Similarity.lloydFit(pts, k = 16, iters = 4, seed = 1L)
    assert(centers.length === 2)
  }

  test("well-separated blobs recover their means") {
    val rnd = new scala.util.Random(11)
    val c1 = Array(0.0, 0.0, 0.0)
    val c2 = Array(10.0, 10.0, 10.0)
    val pts = (blob(rnd, c1, 200) ++ blob(rnd, c2, 200)).toArray
    val centers = Similarity.lloydFit(pts, k = 2, iters = 8, seed = 42L)
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // each true mean has a fitted center within the blob's own radius
    Seq(c1, c2).foreach { c =>
      assert(centers.map(dist(_, c)).min < 0.1, s"no center near ${c.toSeq}")
    }
  }

  test("duplicate-point samples (zero total spread) terminate with finite centers") {
    val pts = Array.fill(20)(Array(3.0, 3.0))
    val centers = Similarity.lloydFit(pts, k = 4, iters = 8, seed = 5L)
    assert(centers.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
    assert(centers.forall(_.sameElements(Array(3.0, 3.0))))
  }
}
