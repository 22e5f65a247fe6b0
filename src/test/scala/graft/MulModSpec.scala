package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels

class MulModSpec extends AnyFunSuite {

  private val M = BigInt(Kernels.M61)
  private val rnd = new scala.util.Random(42)
  private def randOperand(): Long = math.abs(rnd.nextLong()) % Kernels.M61

  test("mulModM61 equals BigInt arithmetic over the full operand range") {
    (1 to 100000).foreach { _ =>
      val a = randOperand()
      val b = randOperand()
      assert(BigInt(Kernels.mulModM61(a, b)) === (BigInt(a) * BigInt(b)) % M, s"a=$a b=$b")
    }
    // adversarial corners
    for {
      a <- Seq(0L, 1L, 2L, Kernels.M61 - 1, Kernels.M61 - 2, (1L << 60) + 12345L)
      b <- Seq(0L, 1L, 2L, Kernels.M61 - 1, Kernels.M61 - 2, (1L << 59) - 1)
    } assert(BigInt(Kernels.mulModM61(a, b)) === (BigInt(a) * BigInt(b)) % M, s"a=$a b=$b")
  }

  test("permutation hash matches the (a*base+b) mod M oracle formulation") {
    (1 to 10000).foreach { _ =>
      val x = math.abs(rnd.nextLong()) % (1L << 60)
      val i = rnd.nextInt(64)
      val a = Kernels.permCoeffA(i)
      val b = Kernels.permCoeffB(i)
      val expect = ((BigInt(a) * BigInt(x) + BigInt(b)) % M).toLong
      var h = Kernels.mulModM61(a, x) + b
      if (h >= Kernels.M61) h -= Kernels.M61
      assert(h === expect, s"x=$x i=$i")
    }
  }
}
