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
