package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CounterSample, GapFillCore}

/** Randomized property tests for the pure gap-fill fold: for ANY sample
  * set, ANY batch split, and ANY in-watermark re-ordering, the concatenated
  * slot emissions (plus the end-of-stream flush) must equal the batch
  * operator's dense grid — every slot exactly once, ascending, samples win
  * their slot by (ts, id), empty slots carry the last value forward.
  * Seeded RNG → deterministic (the repo's property-test convention).
  */
class GapFillCoreSpec extends AnyFunSuite {

  private val stepSec = 100L
  private val rnd = new scala.util.Random(31337)

  private def randomSamples(): List[CounterSample] = {
    val n = 1 + rnd.nextInt(30)
    List.tabulate(n) { i =>
      CounterSample(rnd.nextInt(2000).toLong, f"id$i%03d", rnd.nextInt(100).toDouble)
    }
  }

  private def randomBatches[A](xs: List[A]): List[List[A]] = {
    val k = 1 + rnd.nextInt(5)
    val cuts = List.fill(k - 1)(rnd.nextInt(xs.length + 1)).sorted
    (0 +: cuts :+ xs.length).sliding(2).map { case Seq(a, b) => xs.slice(a, b) }.toList
  }

  /** The batch operator's grid semantics, computed directly. */
  private def batchReference(samples: Seq[CounterSample]): Seq[(Long, Double, Boolean)] = {
    if (samples.isEmpty) return Nil
    val bySlot = samples.groupBy(s => GapFillCore.slotOf(s.ts, stepSec))
    val lo = bySlot.keys.min
    val hi = bySlot.keys.max
    var carry = 0.0
    (lo to hi by stepSec).map { slot =>
      bySlot.get(slot) match {
        case Some(here) =>
          carry = here.maxBy(s => (s.ts, s.id)).value
          (slot, carry, false)
        case None => (slot, carry, true)
      }
    }
  }

  test("incremental grid equals the batch grid for any batching and lateness") {
    (1 to 500).foreach { caseNo =>
      val samples = randomSamples()
      val batches = randomBatches(rnd.shuffle(samples))
      var st = GapFillCore.empty
      var wmSec = 0L
      var wmSet = false
      val emitted = scala.collection.mutable.ListBuffer.empty[(Long, Double, Boolean)]
      val accepted = scala.collection.mutable.ListBuffer.empty[CounterSample]
      batches.foreach { batch =>
        // Spark drops rows below the watermark before the operator
        val admitted = if (wmSet) batch.filter(_.ts >= wmSec) else batch
        accepted ++= admitted
        val r = GapFillCore.step(st, admitted, wmSec, stepSec)
        st = r.state
        emitted ++= r.emitted
        if (admitted.nonEmpty) {
          wmSec = math.max(wmSec, admitted.map(_.ts).max)
          wmSet = true
        }
      }
      emitted ++= GapFillCore.flush(st, stepSec)
      val expected = batchReference(accepted.toList)
      val slots = emitted.map(_._1)
      assert(slots.distinct.size === slots.size, s"case $caseNo: slot emitted twice: $emitted")
      assert(slots.toList === slots.toList.sorted, s"case $caseNo: out of order: $emitted")
      assert(emitted.toList === expected.toList,
        s"case $caseNo: incremental=$emitted expected=$expected samples=$samples")
    }
  }

  test("buffer stays bounded by the emitted frontier") {
    (1 to 200).foreach { _ =>
      var st = GapFillCore.empty
      val sorted = randomSamples().sortBy(s => (s.ts, s.id))
      sorted.grouped(4).foreach { batch =>
        val wm = batch.map(_.ts).max
        st = GapFillCore.step(st, batch, wm, stepSec).state
        if (st.hasLast)
          assert(st.buffer.forall(s => GapFillCore.slotOf(s.ts, stepSec) > st.lastSlot),
            s"buffer holds samples at or below the emitted frontier: $st")
      }
    }
  }
}
