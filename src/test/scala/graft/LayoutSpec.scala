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

  test("dynamic partition pruning injects a runtime filter into the fact scan") {
    // the 100 TB join shape: a hive-partitioned fact joined to a SELECTIVE
    // dim on the partition column must not scan every fact partition —
    // Spark's DPP turns the dim's build side into a runtime partition
    // filter. Static pruning can't help (the predicate is on the dim, not
    // the fact), so `dynamicpruningexpression` in the fact's
    // PartitionFilters is the whole story.
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dpp").toFile.getAbsolutePath
    Firehose.eventsRaw(spark, sfDir).write.partitionBy("event_type")
      .parquet(s"$root/fact")
    val fact = spark.read.parquet(s"$root/fact")
    // the dim must be file-backed: over a LocalRelation the optimizer folds
    // the filter away (ConvertToLocalRelation) and DPP sees no selective
    // predicate to reuse — which is also the honest cluster shape
    Seq(("purchase", "rev"), ("refund", "rev"), ("view", "traffic"))
      .toDF("event_type", "category").write.parquet(s"$root/dim")
    val dim = spark.read.parquet(s"$root/dim")
    val joined = fact
      .join(dim.filter(col("category") === "rev"), "event_type")
      .agg(count(lit(1)).as("n"))
    val expected = Firehose.eventsRaw(spark, sfDir)
      .filter(col("event_type").isin("purchase", "refund")).count()
    assert(joined.collect()(0).getLong(0) === expected)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning in fact scan:\n${plan.take(2000)}")
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

  test("z-value interleaves bits in Morton order") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        graft.operators.Layout.zValue(Seq(col("x"), col("y")), bits = 3).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // classic Morton: z(x,y) interleaves x at even bits, y at odd bits
    assert(out((0L, 0L)) === 0L)
    assert(out((1L, 0L)) === 1L)
    assert(out((0L, 1L)) === 2L)
    assert(out((1L, 1L)) === 3L)
    assert(out((2L, 2L)) === 12L)
    // x=3 (011), y=5 (101) → interleave: 100111 = 39
    assert(out((3L, 5L)) === 39L)
  }

  test("z-order layout bounds every dimension's file footprint, linear sort doesn't") {
    import spark.implicits._
    // 100×100 grid, one row per cell; 16 files per layout
    val grid = (0 until 100).flatMap(x => (0 until 100).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val zDir = Files.createTempDirectory("graft-zorder").toFile.getAbsolutePath + "/z"
    val linDir = Files.createTempDirectory("graft-linear").toFile.getAbsolutePath + "/lin"
    graft.operators.Layout.zorderBy(grid, Seq("x", "y"), numFiles = 16).write.parquet(zDir)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x").write.parquet(linDir)
    // per-file min/max footprint — what any stats-based reader prunes on
    def footprints(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .collect()
    def touching(fps: Array[org.apache.spark.sql.Row], lo: Long, hi: Long, dim: String) =
      fps.count { r =>
        val (a, b) = if (dim == "x") (r.getLong(1), r.getLong(2)) else (r.getLong(3), r.getLong(4))
        a <= hi && b >= lo
      }
    val zFp = footprints(zDir)
    val linFp = footprints(linDir)
    assert(zFp.length === 16 && linFp.length === 16)
    // selective predicate on y: the x-sorted layout has every file spanning
    // all of y → all 16 files touched; the z-order layout must prune
    val linY = touching(linFp, 10, 19, "y")
    val zY = touching(zFp, 10, 19, "y")
    assert(linY === 16, s"expected the linear layout to touch all files, got $linY")
    assert(zY <= 8, s"z-order should bound the y footprint, touched $zY/16 files")
    // and x stays prunable too (both layouts good here; z must not regress
    // to worse than half the files for a 10% slice)
    assert(touching(zFp, 10, 19, "x") <= 8)
  }

  test("footprint-pruned read skips files on a z-range predicate with identical results") {
    import spark.implicits._
    val grid = (0 until 100).flatMap(x => (0 until 100).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dir = Files.createTempDirectory("graft-zread").toFile.getAbsolutePath + "/z"
    graft.operators.Layout.landZordered(grid, Seq("x", "y"), dir, numFiles = 16)
    // the footprint must not pollute plain data reads (underscore-hidden)
    assert(spark.read.parquet(dir).count() === 10000L)
    val pruned = graft.operators.Layout.footprintPrunedRead(spark, dir, "y", 10L, 19L)
    val full = spark.read.parquet(dir).filter(col("y").between(10, 19))
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      full.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // the scan itself must touch fewer files than the directory holds —
    // the pruning happened BEFORE the reader, not in a post-scan filter
    val scannedFiles = pruned.queryExecution.sparkPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.count(!_.contains("_footprint"))
    }.sum
    assert(scannedFiles <= 8, s"expected ≤8/16 files at the scan, got $scannedFiles")
    // empty intersection: no file qualifies, results are empty, schema holds
    val none = graft.operators.Layout.footprintPrunedRead(spark, dir, "y", 1000L, 2000L)
    assert(none.count() === 0L)
    assert(none.schema.fieldNames.toSeq === Seq("x", "y"))
    // conjunction: both dimensions prune at once — the skip sets multiply,
    // so the 10%×10% tile touches no more files than either slice alone
    val tile = graft.operators.Layout.footprintPrunedRead(
      spark, dir, Seq(("x", 10L, 19L), ("y", 10L, 19L)))
    assert(tile.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      spark.read.parquet(dir)
        .filter(col("x").between(10, 19) && col("y").between(10, 19))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    val tileFiles = tile.queryExecution.sparkPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.count(!_.contains("_footprint"))
    }.sum
    assert(tileFiles <= 4, s"expected the 2-D tile to touch ≤4/16 files, got $tileFiles")
  }
}
