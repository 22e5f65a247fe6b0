package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSuite {

  test("salted join is row-equivalent to the plain join under heavy skew") {
    import spark.implicits._
    // 10k rows on one hot key + a tail
    val big = spark.range(10000).select(
      when($"id" < 9000, lit(1L)).otherwise($"id" % 50).as("k"),
      $"id".as("payload"))
    val small = Seq((1L, "hot"), (7L, "cold"), (49L, "tail")).toDF("k", "name")

    val plain = big.join(small, "k").groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(big, small, "k", salt = 8).groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    // 9000 hot rows + the tail ids ≡ 1 (mod 50) in [9000, 10000)
    assert(plain("hot") === 9020L)
  }

  test("AQE splits a skewed shuffle join at runtime") {
    import spark.implicits._
    val prev = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.forceOptimizeSkewedJoin" ->
        spark.conf.get("spark.sql.adaptive.forceOptimizeSkewedJoin"))
    try {
      // thresholds low enough that the synthetic hot key trips the detector
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      // the downstream groupBy(k) would otherwise veto the split (it reuses
      // the join's hash distribution; splitting adds a shuffle back)
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // one hot key on the fact side; dim side is per-key unique so the
      // join output stays linear and the skew is purely a partition-size story
      val big = spark.range(200000).select(
        when($"id" < 190000, lit(1L)).otherwise($"id" % 50).as("k"),
        $"id".as("payload"))
      val right = spark.range(50).select($"id".as("k"), ($"id" * 10).as("other"))
      val joined = big.join(right, "k").groupBy("k").count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") && plan.contains("skewed"),
        s"AQE did not mark the skewed join:\n${plan.take(3000)}")
    } finally prev.foreach { case (key, value) => spark.conf.set(key, value) }
  }

  /** Hot-SERIES stress for the metric path (§5's skew story, measured):
    * one series carrying 50% of all samples flows through the two
    * aggregation shapes the m-operators use, and the shuffle metrics
    * must show
    *
    *  - the PARTIAL-AGG shape (gauge / the `*_over_time` sums): the
    *    exchange carries one partial row per (series × map partition),
    *    NOT per sample — the hot series contributes exactly as many
    *    shuffle rows as any tail series, so the exchange is balanced by
    *    construction and NO salting is ever needed on this path;
    *  - the SEQUENTIAL-LAG shape (`increase`/`rate`'s per-series
    *    `lag` over sample order): semantically unsaltable — the hot
    *    series' samples MUST meet in one task in order. The exchange
    *    carries every sample and the hot task reads ≥ its 50%. This is
    *    the documented bound: the cost is O(hot-series samples) in one
    *    task, mitigated by range (windows bound what a query touches),
    *    never by salt (a salted lag would break delta adjacency).
    *    Salting IS the answer only for skewed JOINS (the tests above).
    */
  test("hot series: partial-agg exchanges stay sample-free; the lag exchange is the documented bound") {
    import spark.implicits._
    val n = 240000L
    val samples = spark.range(n).select(
      lit("app").as("component"),
      lit("x_total").as("name"),
      map(lit("user"),
        when($"id" % 2 === 0, lit("hot"))
          .otherwise(concat(lit("u"), ($"id" % 1000).cast("string"))))
        .as("labels"),
      ($"id" % 86400).as("timestamp"), // 24 hourly windows
      $"id".cast("string").as("id"),
      ($"id" % 97).cast("double").as("value"))
      .repartition(16)
      .localCheckpoint() // freeze the input so each measurement scans, not recomputes

    val writes = new java.util.concurrent.atomic.AtomicLong
    val maxRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        writes.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
        maxRead.getAndAccumulate(
          te.taskMetrics.shuffleReadMetrics.recordsRead, math.max(_, _))
      }
    }
    def measured(action: => Long): (Long, Long, Long) = {
      writes.set(0); maxRead.set(0)
      val rows = action
      // listener delivery is async — poll until the write count is stable
      val deadline = System.nanoTime() + 30e9.toLong
      var last = -1L
      while (writes.get() != last && System.nanoTime() < deadline) {
        last = writes.get(); Thread.sleep(200)
      }
      (rows, writes.get(), maxRead.get())
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // gauge: groupBy(series) max_by — 1001 series × ≤16 map partitions
      // of partials ≈ 16k rows on the wire for 240k samples
      // actions consume the VALUE columns (count() alone would let
      // column pruning drop the aggregates — and for increase, the lag
      // itself — measuring a plan nobody runs)
      def force(df: org.apache.spark.sql.DataFrame, valueCol: String): Long = {
        val r = df.agg(count(lit(1)), sum(col(valueCol))).head()
        assert(!r.isNullAt(1)); r.getLong(0)
      }
      // 501 series: "hot" (all even ids) + the 500 odd residues
      val (gRows, gWrites, gMaxRead) =
        measured(force(graft.operators.Firehose.gaugeLatest(samples), "last_value"))
      assert(gRows === 501L)
      assert(gWrites <= n / 10,
        s"gauge exchange carried $gWrites records for $n samples — partial agg lost")
      assert(gMaxRead <= gWrites, s"reduce task read $gMaxRead of $gWrites")
      // increase: the lag exchange is per-sample BY SEMANTICS and the
      // hot series lands whole in one ordered task (the post-lag window
      // aggregation reuses the same hash distribution — one shuffle, no
      // second exchange to balance)
      val (iRows, iWrites, iMaxRead) =
        measured(force(graft.operators.Firehose.counterIncrease(samples), "increase"))
      assert(iRows === 501L * 24)
      assert(iWrites >= n, s"lag exchange wrote $iWrites — expected ≥ $n (per-sample)")
      assert(iMaxRead >= n / 2,
        s"hot-series task read $iMaxRead — expected its full 50% share (${n / 2})")
      info(s"gauge: $gWrites shuffle records for $n samples (${
        "%.2f".format(100.0 * gWrites / n)}%), max task read $gMaxRead")
      info(s"increase: $iWrites shuffle records, hot task read $iMaxRead (${
        "%.1f".format(100.0 * iMaxRead / n)}% of samples)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("salt values are deterministic and well-spread") {
    import spark.implicits._
    val df = spark.range(1000).select($"id", Skew.saltOf(8, $"id").as("s"))
    val counts = df.groupBy("s").count().collect().map(r => r.getLong(1))
    assert(counts.length === 8)
    assert(counts.min > 50, s"badly skewed salt: ${counts.mkString(",")}")
    // deterministic: same expression twice gives identical assignment
    val again = spark.range(1000).select($"id", Skew.saltOf(8, $"id").as("s"))
    assert(df.except(again).count() === 0)
  }
}
