package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions

/** Differential fuzz for [[org.apache.spark.sql.graft.MaxByTsId]] — the
  * m64 playbook: the typed aggregate must pick byte-identical winners to
  * the built-in `max_by(value, struct(ts, id))` on adversarial inputs
  * (null fields, empty/“almost-equal” ids, non-ASCII ids whose UTF-16 and
  * UTF-8 orders diverge, NaN/±0.0 double keys), across many partitions so
  * the partial/merge/serialize path is exercised, AND must actually route
  * the plan through ObjectHashAggregate (the point of the swap).
  */
class MaxByTsIdSpec extends SparkSuite {

  private def compare(
      rows: Seq[Row], schema: StructType, tsCol: String = "ts"): Unit = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema).repartition(7)
    val legacy = df.groupBy("g")
      .agg(max_by(col("v"), struct(col(tsCol), col("id"))).as("w"))
      .collect().map(r => r.get(0) -> r.get(1)).toMap
    val typed = df.groupBy("g")
      .agg(GraftFunctions.max_by_ts_id(col("v"), col(tsCol), col("id")).as("w"))
      .collect().map(r => r.get(0) -> r.get(1)).toMap
    assert(typed === legacy)
  }

  test("fuzz: long ts, double value, nulls everywhere, unique ids") {
    val rnd = new scala.util.Random(414213)
    val schema = StructType(Seq(
      StructField("g", IntegerType), StructField("v", DoubleType),
      StructField("ts", LongType), StructField("id", StringType)))
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(400)
      val rows = (0 until n).map { i =>
        val ts: Any =
          if (rnd.nextInt(10) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(20).toLong)
        val id: Any =
          if (rnd.nextInt(12) == 0) null
          else f"e$i%04d" // unique per row — the engine's id contract
        val v: Any =
          if (rnd.nextInt(8) == 0) null else java.lang.Double.valueOf(rnd.nextDouble())
        Row(rnd.nextInt(6), v, ts, id)
      }
      compare(rows, schema)
    }
  }

  test("non-ASCII ids order by UTF-8 bytes, not UTF-16 code units") {
    // U+FF01 (ＢMP, 3-byte UTF-8 ef bc 81) vs U+10002 (supplementary,
    // 4-byte f0 90 80 82; UTF-16 surrogate d800 dc02 sorts BELOW ff01):
    // the two orders disagree — the aggregate must take UTF-8 bytes
    val schema = StructType(Seq(
      StructField("g", IntegerType), StructField("v", DoubleType),
      StructField("ts", LongType), StructField("id", StringType)))
    val rows = Seq(
      Row(1, 1.0, 5L, "！"),
      Row(1, 2.0, 5L, new String(Character.toChars(0x10002))),
      Row(1, 3.0, 5L, ""),
      Row(1, 4.0, 5L, "z"))
    compare(rows, schema)
  }

  test("double ts keys: NaN greatest, -0.0 equals 0.0 (unique id decides)") {
    val schema = StructType(Seq(
      StructField("g", IntegerType), StructField("v", DoubleType),
      StructField("ts", DoubleType), StructField("id", StringType)))
    val rnd = new scala.util.Random(7)
    val specials = Array(Double.NaN, 0.0, -0.0, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.5, -1.5)
    (1 to 10).foreach { _ =>
      val rows = (0 until 120).map { i =>
        Row(rnd.nextInt(4), rnd.nextDouble(): java.lang.Double,
          specials(rnd.nextInt(specials.length)): java.lang.Double, f"i$i%03d")
      }
      compare(rows, schema)
    }
  }

  test("struct-typed value round-trips the serializer") {
    val rnd = new scala.util.Random(99)
    val schema = StructType(Seq(
      StructField("g", IntegerType),
      StructField("v", StructType(Seq(
        StructField("a", DoubleType), StructField("b", StringType)))),
      StructField("ts", LongType), StructField("id", StringType)))
    val rows = (0 until 300).map { i =>
      Row(rnd.nextInt(5),
        if (rnd.nextInt(6) == 0) null else Row(rnd.nextDouble(), s"s$i"),
        java.lang.Long.valueOf(rnd.nextInt(9).toLong), f"x$i%03d")
    }
    compare(rows, schema)
  }

  test("gaugeLatest equals the pre-swap max_by spelling and hash-aggregates") {
    val m = operators.Firehose.metricsFromEvents(spark, sfDir)
    val now = operators.Firehose.gaugeLatest(m)
    val legacy = operators.Firehose.tagFilter(m)
      .withColumn("series", operators.Firehose.seriesKey(col("labels")))
      .groupBy(col("component"), col("name"), col("series"))
      .agg(
        max_by(col("value"), struct(col("timestamp"), col("id"))).as("last_value"),
        max(col("timestamp")).as("last_ts"))
    assert(now.collect().toSet === legacy.collect().toSet)
    val plan = now.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
    assert(!plan.contains("SortAggregate"), s"sort aggregate survived:\n$plan")
  }
}
