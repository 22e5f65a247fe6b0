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
