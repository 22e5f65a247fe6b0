package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Firehose

/** Storage-layout scale levers: partition pruning and bucketed
  * (shuffle-free) joins — the mechanisms a 100 TB deployment relies on to
  * avoid reading or shuffling data it doesn't need.
  */
class LayoutSpec extends SparkSuite {

  test("hive-partitioned landing prunes partitions at the scan") {
    val out = Files.createTempDirectory("graft-part").toFile.getAbsolutePath + "/landed"
    Firehose.eventsRaw(spark, sfDir).write.partitionBy("event_type").parquet(out)
    val df = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val expected = Firehose.eventsRaw(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(df.count() === expected)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition pruning missing:\n${plan.take(1500)}")
    // the pruned scan must not carry a post-scan filter on the partition col
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type"),
      "partition column leaked into data filters")
  }

  test("bucketed tables join without a shuffle exchange") {
    val e = Firehose.eventsRaw(spark, sfDir).select("event_id", "user_id", "value")
    spark.sql("DROP TABLE IF EXISTS ev_a")
    spark.sql("DROP TABLE IF EXISTS ev_b")
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // directories persist; clear them so saveAsTable can re-create
    for (t <- Seq("ev_a", "ev_b")) {
      val d = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.delete(p); () })
      }
    }
    e.write.bucketBy(8, "user_id").sortBy("user_id").saveAsTable("ev_a")
    e.groupBy("user_id").agg(sum("value").as("total"))
      .write.bucketBy(8, "user_id").saveAsTable("ev_b")
    val joined = spark.table("ev_a").join(spark.table("ev_b"), "user_id")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${plan.take(1500)}")
  }
}
