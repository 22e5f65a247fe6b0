package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AbsentCore

/** Randomized property tests for the pure absent-alert fold: for ANY set of
  * present windows, ANY split into micro-batches and ANY in-watermark
  * arrival order, the emissions must be exactly the batch gap rule — the
  * first missing window of every gap between present windows, plus the
  * trailing silence window once the watermark decides it — each exactly
  * once. Seeded RNG → deterministic (the repo's property-test convention).
  */
class AbsentCoreSpec extends AnyFunSuite {

  private val width = 100L
  private val rnd = new scala.util.Random(77319)

  test("fold emits each gap's first missing window exactly once, for any batching") {
    (1 to 500).foreach { caseNo =>
      // sample timestamps on a grid; several per window, with gaps
      val n = 1 + rnd.nextInt(25)
      val ts = List.fill(n)(rnd.nextInt(2000).toLong)
      val k = 1 + rnd.nextInt(5)
      val shuffled = rnd.shuffle(ts)
      val cuts = List.fill(k - 1)(rnd.nextInt(n + 1)).sorted
      val batches = (0 +: cuts :+ n).sliding(2).map { case Seq(a, b) =>
        shuffled.slice(a, b)
      }.toList
      var st = AbsentCore.empty
      var wmSec = 0L
      var wmSet = false
      val emitted = scala.collection.mutable.ListBuffer.empty[Long]
      val accepted = scala.collection.mutable.ListBuffer.empty[Long]
      batches.foreach { batch =>
        val admitted = if (wmSet) batch.filter(_ >= wmSec) else batch
        accepted ++= admitted
        val wins = admitted.map(t => t - math.floorMod(t, width))
        val r = AbsentCore.step(st, wins, wmSec, width)
        st = r.state
        emitted ++= r.emitted
        if (admitted.nonEmpty) {
          wmSec = math.max(wmSec, admitted.max)
          wmSet = true
        }
      }
      // drive the watermark far past everything (idle timer firings)
      (1 to 3).foreach { i =>
        val r = AbsentCore.step(st, Nil, wmSec + i * 10 * width, width)
        st = r.state
        emitted ++= r.emitted
      }
      // batch rule over the admitted samples: first missing window of every
      // gap between consecutive present windows, plus the trailing window
      // (the final watermark is far beyond every present window)
      val present: List[Long] =
        accepted.toList.map(t => t - math.floorMod(t, width)).distinct.sorted
      val gaps = present.sliding(2).collect {
        case List(a, b) if b > a + width => a + width
      }.toList
      val expected = if (present.isEmpty) Nil else gaps :+ (present.max + width)
      assert(emitted.sorted === expected.sorted,
        s"case $caseNo: emitted=${emitted.toList.sorted} expected=${expected.sorted} ts=$ts")
      assert(emitted.distinct.length === emitted.length,
        s"case $caseNo: duplicate emission in ${emitted.toList}")
    }
  }
}
