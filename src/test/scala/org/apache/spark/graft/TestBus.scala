package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` listener plumbing: the specs
  * that COUNT Spark jobs (the landing server's per-version `newestTs`
  * memoization) must drain the asynchronous listener bus before reading
  * their counters, or the assertion races the event delivery.
  */
object TestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
