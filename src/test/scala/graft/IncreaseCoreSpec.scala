package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CounterSample, IncreaseCore}

/** Randomized property tests for the shared counter-increase fold: for ANY
  * sample set, ANY split into micro-batches, and ANY in-watermark
  * re-ordering, the final per-window values the incremental fold emits must
  * equal the batch operator's semantics over the union of admitted samples.
  * This pins the late-data guarantee far beyond the two hand-written
  * streaming scenarios, and without a streaming query — the fold is pure.
  * Seeded RNG → deterministic (the repo's property-test convention).
  */
class IncreaseCoreSpec extends AnyFunSuite {

  private val widthSec = 100L
  private val rnd = new scala.util.Random(4242)

  // samples on a small ts grid with integer values: window collisions,
  // timestamp ties and counter resets all occur; ids disambiguate ties
  private def randomSamples(): List[CounterSample] = {
    val n = 1 + rnd.nextInt(40)
    List.tabulate(n) { i =>
      CounterSample(rnd.nextInt(500).toLong, f"id$i%03d", rnd.nextInt(51).toDouble)
    }
  }

  // split a list into 1..5 consecutive arrival chunks (the micro-batches)
  private def randomBatches[A](xs: List[A]): List[List[A]] = {
    val k = 1 + rnd.nextInt(5)
    val cuts = List.fill(k - 1)(rnd.nextInt(xs.length + 1)).sorted
    (0 +: cuts :+ xs.length).sliding(2).map { case Seq(a, b) => xs.slice(a, b) }.toList
  }

  test("incremental fold equals batch semantics for any batching and in-watermark lateness") {
    (1 to 500).foreach { caseNo =>
      val samples = randomSamples()
      // arrival order is a shuffle of event order — late arrivals constantly
      val batches = randomBatches(rnd.shuffle(samples))
      var st = IncreaseCore.empty
      var wmSec = 0L
      var wmSet = false
      val lastEmit = scala.collection.mutable.Map.empty[Long, Double]
      val accepted = scala.collection.mutable.ListBuffer.empty[CounterSample]
      batches.foreach { batch =>
        // Spark drops rows below the watermark before the operator; mirror it
        val admitted = if (wmSet) batch.filter(_.ts >= wmSec) else batch
        accepted ++= admitted
        val r = IncreaseCore.step(st, admitted, wmSec, widthSec)
        st = r.state
        r.running.foreach { case (w, v) => lastEmit(w) = v }
        // 0-delay watermark: advances to the max event time seen so far
        if (admitted.nonEmpty) {
          wmSec = math.max(wmSec, admitted.map(_.ts).max)
          wmSet = true
        }
      }
      val expected = IncreaseCore.batchReference(accepted.toList, widthSec)
      assert(lastEmit.toMap === expected,
        s"case $caseNo: incremental=$lastEmit expected=$expected samples=$samples")
    }
  }

  test("closed-window emission fires exactly once per window with the final value") {
    (1 to 300).foreach { caseNo =>
      val samples = randomSamples()
      val batches = randomBatches(rnd.shuffle(samples))
      var st = IncreaseCore.empty
      var wmSec = 0L
      var wmSet = false
      val closedEmits = scala.collection.mutable.ListBuffer.empty[(Long, Double)]
      val accepted = scala.collection.mutable.ListBuffer.empty[CounterSample]
      batches.foreach { batch =>
        val admitted = if (wmSet) batch.filter(_.ts >= wmSec) else batch
        accepted ++= admitted
        val r = IncreaseCore.step(st, admitted, wmSec, widthSec)
        st = r.state
        closedEmits ++= r.closed
        if (admitted.nonEmpty) {
          wmSec = math.max(wmSec, admitted.map(_.ts).max)
          wmSet = true
        }
      }
      // stream end: TTL flush closes everything still open
      closedEmits ++= IncreaseCore.flush(st, widthSec)
      val expected = IncreaseCore.batchReference(accepted.toList, widthSec)
      // exactly once per window...
      val wins = closedEmits.map(_._1)
      assert(wins.distinct.size === wins.size,
        s"case $caseNo: window closed twice: $closedEmits")
      // ...with exactly the batch-semantics final value
      assert(closedEmits.toMap === expected,
        s"case $caseNo: closed=$closedEmits expected=$expected")
    }
  }

  test("state buffer and finalized windows stay bounded by the watermark horizon") {
    (1 to 200).foreach { _ =>
      var st = IncreaseCore.empty
      val sorted = randomSamples().sortBy(s => (s.ts, s.id))
      sorted.grouped(5).foreach { batch =>
        val wm = batch.map(_.ts).max // 0-delay watermark after this batch
        val r = IncreaseCore.step(st, batch, wm, widthSec)
        st = r.state
        assert(st.buffer.forall(_.ts >= wm),
          s"buffer holds samples below the watermark: ${st.buffer} wm=$wm")
        assert(st.finalized.keys.forall(_ + widthSec > wm),
          s"finalized holds closed windows: ${st.finalized} wm=$wm")
      }
    }
  }
}
