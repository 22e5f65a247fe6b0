package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CounterSample, ResetsCore}

/** Randomized property tests for the shared resets/changes fold: for ANY
  * sample set, ANY micro-batch split, and ANY in-watermark re-ordering, the
  * last running totals the incremental fold emits must equal the batch
  * operator's counts over the union of admitted samples. Same harness
  * convention as [[IncreaseCoreSpec]]; seeded RNG → deterministic.
  */
class ResetsCoreSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(2424)

  private def randomSamples(): List[CounterSample] = {
    val n = 1 + rnd.nextInt(40)
    List.tabulate(n) { i =>
      CounterSample(rnd.nextInt(500).toLong, f"id$i%03d", rnd.nextInt(51).toDouble)
    }
  }

  private def randomBatches[A](xs: List[A]): List[List[A]] = {
    val k = 1 + rnd.nextInt(5)
    val cuts = List.fill(k - 1)(rnd.nextInt(xs.length + 1)).sorted
    (0 +: cuts :+ xs.length).sliding(2).map { case Seq(a, b) => xs.slice(a, b) }.toList
  }

  test("incremental resets/changes equals batch counts for any batching and lateness") {
    (1 to 500).foreach { caseNo =>
      val samples = randomSamples()
      val batches = randomBatches(rnd.shuffle(samples))
      var st = ResetsCore.empty
      var wmSec = 0L
      var wmSet = false
      var last = ResetsCore.ResetsTotals(0, 0, 0)
      val accepted = scala.collection.mutable.ListBuffer.empty[CounterSample]
      batches.foreach { batch =>
        // Spark drops rows below the watermark before the operator; mirror it
        val admitted = if (wmSet) batch.filter(_.ts >= wmSec) else batch
        accepted ++= admitted
        val r = ResetsCore.step(st, admitted, wmSec)
        st = r.state
        last = r.out
        if (admitted.nonEmpty) {
          wmSec = math.max(wmSec, admitted.map(_.ts).max)
          wmSet = true
        }
      }
      val expected = ResetsCore.batchReference(accepted.toList)
      assert(last === expected,
        s"case $caseNo: incremental=$last expected=$expected samples=$samples")
    }
  }

  test("running totals are monotone in the frozen region across steps") {
    (1 to 200).foreach { _ =>
      val samples = randomSamples()
      val batches = randomBatches(rnd.shuffle(samples))
      var st = ResetsCore.empty
      var wmSec = 0L
      var wmSet = false
      batches.foreach { batch =>
        val admitted = if (wmSet) batch.filter(_.ts >= wmSec) else batch
        val before = (st.frozenResets, st.frozenChanges, st.frozenN)
        val r = ResetsCore.step(st, admitted, wmSec)
        st = r.state
        // frozen counts never decrease (they cover an immutable prefix)
        assert(st.frozenResets >= before._1)
        assert(st.frozenChanges >= before._2)
        assert(st.frozenN >= before._3)
        // running output = frozen floor + live contributions
        assert(r.out.resets >= st.frozenResets && r.out.changes >= st.frozenChanges)
        assert(r.out.n === st.frozenN + st.buffer.size.toLong)
        if (admitted.nonEmpty) {
          wmSec = math.max(wmSec, admitted.map(_.ts).max)
          wmSet = true
        }
      }
    }
  }
}
