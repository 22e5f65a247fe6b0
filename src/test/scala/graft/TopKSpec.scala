package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftOps, TopKPerKeyExec}

import graft.operators.Relational

class TopKSpec extends SparkSuite {

  test("native top-k matches the window formulation row-for-row") {
    val window = Relational.qTopkPerGroup(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(_.toSeq).toSet
    val native = Relational.qTopkNative(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(native === window)
    assert(native.nonEmpty)
  }

  test("native top-k plans through TopKPerKeyExec without a sort") {
    val df = Relational.qTopkNative(spark, sfDir)
    df.collect() // finalize the adaptive plan so the inner plan is visible
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"missing custom exec:\n$plan")
    assert(!plan.contains("Sort "), s"unexpected sort in:\n$plan")
  }

  test("key-only filters push through the custom operator into the scan") {
    import org.apache.spark.sql.functions.col
    val df = Relational.qTopkNative(spark, sfDir).filter(col("o_custkey") < 50)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"missing custom exec:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), LessThan(o_custkey,50)"),
      s"key filter did not reach the parquet scan:\n$plan")
    // results must equal filter-after semantics (groups kept/dropped whole)
    val expect = Relational.qTopkPerGroup(spark, sfDir)
      .filter(col("o_custkey") < 50)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet === expect)
  }

  test("top-k runs a map-side partial pass below the exchange") {
    val df = Relational.qTopkNative(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // partial pass below the shuffle, final above — the partial-agg pattern
    assert(plan.contains("TopKPerKeyPartial"), s"missing partial pass:\n$plan")
    val idxPartial = plan.indexOf("TopKPerKeyPartial")
    val idxExchange = plan.indexOf("Exchange")
    assert(idxExchange >= 0 && idxExchange < idxPartial,
      s"partial pass must sit below the exchange:\n$plan")
  }

  test("whole-stage codegen covers the partial pass (no iterator boundary under the exchange)") {
    val df = Relational.qTopkNative(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // a codegen'd node prints with the `*(stage)` marker: the scan→partial
    // chain must be one fused stage, not an InputAdapter boundary, and the
    // final pass above the exchange codegens too
    assert("""\*\(\d+\) TopKPerKeyPartial""".r.findFirstIn(plan).isDefined,
      s"partial pass not inside WholeStageCodegen:\n$plan")
    assert("""\*\(\d+\) TopKPerKey\b""".r.findFirstIn(plan).isDefined,
      s"final pass not inside WholeStageCodegen:\n$plan")
    val window = Relational.qTopkPerGroup(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(_.toSeq).toSet
    val native = df.collect().map(_.toSeq).toSet
    assert(native === window)
  }

  test("partial+final composition is exact across adversarial partitionings") {
    import spark.implicits._
    // every key's best rows deliberately spread across partitions
    val df = (0 until 1000).map(i => ((i % 7).toLong, i.toLong, (i % 13).toDouble))
      .toDF("k", "id", "v").repartition(11, col("id"))
    val native = GraftOps.topKPerKey(df, Seq("k"), Seq("v" -> true, "id" -> false), 3)
      .as[(Long, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v").desc, col("id"))
    val expect = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("k", "id", "v").as[(Long, Long, Double)].collect().toSet
    assert(native === expect)
  }

  test("ties and k larger than group size behave like row_number semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 9.0),
      (2L, 20L, 1.0))
      .toDF("k", "id", "v")
    val out = GraftOps.topKPerKey(df, Seq("k"), Seq("v" -> true, "id" -> false), 3)
      .as[(Long, Long, Double)].collect().toSet
    // group 1: 9.0 first, then the two lowest ids among the 5.0 ties
    assert(out === Set((1L, 13L, 9.0), (1L, 10L, 5.0), (1L, 11L, 5.0), (2L, 20L, 1.0)))
  }
}
