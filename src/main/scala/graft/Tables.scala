package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Re-spread a narrow scan across the cluster before CPU-heavy per-row
    * work. The testdata tables are single parquet files (one row group → one
    * input partition), which would serialize parse/hash-heavy chains onto a
    * single core; a real 100 TB table has thousands of splits and skips the
    * shuffle (the `p * 2 >= target` branch).
    */
  def widen(df: DataFrame): DataFrame = {
    val p = df.rdd.getNumPartitions
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (p * 2 < target) df.repartition(target) else df
  }

  /** Bounded uniform training sample for in-operator model fitting (IVF
    * centroids, the distilled quality model): a seeded per-partition
    * reservoir of `maxRows / partitions` elements. Selects uniformly across
    * each whole split (a prefix/`limit()` would bias toward each split's
    * leading key range on clustered/sorted tables), needs no `count()` of
    * the corpus and no shuffle, and is deterministic for a given input and
    * `seedSalt`. The per-partition quota makes the sample proportional to
    * partition count, not row count — fine for sketching a distribution,
    * not a uniform sample across skewed partition SIZES.
    */
  def reservoirSample(df: DataFrame, maxRows: Long, seedSalt: Long): DataFrame = {
    val parts = math.max(1, df.rdd.getNumPartitions)
    val perPart = math.max(1, (maxRows / parts).toInt)
    df.sparkSession.createDataFrame(
      df.rdd.mapPartitionsWithIndex { (idx, it) =>
        val rnd = new scala.util.Random(42L * seedSalt + idx)
        val reservoir = new Array[org.apache.spark.sql.Row](perPart)
        var seen = 0L
        it.foreach { row =>
          if (seen < perPart) reservoir(seen.toInt) = row
          else {
            val j = (rnd.nextDouble() * (seen + 1)).toLong
            if (j < perPart) reservoir(j.toInt) = row
          }
          seen += 1
        }
        reservoir.iterator.take(math.min(seen, perPart.toLong).toInt)
      }, df.schema)
  }

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's µs TimestampType
    * cannot hold natively; read it as nanos-since-epoch long and expose both
    * the raw nanos and a µs-truncated timestamp column. */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")

  /** Eagerly materialize a SMALL multi-consumer intermediate without pinning
    * it in the session's cache manager. `persist()` entries live until an
    * explicit `unpersist()` — inside an operator there is no safe point to
    * drop them (the returned plan still references the cached relation), so
    * library callers accumulate pinned storage for the life of the session.
    * A checkpoint instead stores blocks owned by the returned plan's RDD,
    * reclaimed when the caller drops the DataFrame: `localCheckpoint` blocks
    * by the ContextCleaner unconditionally; reliable checkpoint FILES only
    * when `spark.cleaner.referenceTracking.cleanCheckpoints=true` (read once
    * at context construction — [[graft.Sessions.local]] sets it; sessions
    * built elsewhere should too, or the checkpoint dir accumulates forever).
    *
    * Uses the reliable checkpoint when the caller configured a checkpoint
    * dir — the right choice on a real cluster, where `localCheckpoint`'s
    * truncated lineage makes the blocks unrecoverable after executor loss or
    * dynamic-allocation decommission. The no-checkpoint-dir fallback is for
    * local/bench use; cluster deployments should set a checkpoint dir (or
    * disable dynamic allocation). Note both branches are EAGER: calling an
    * operator built on this runs its upstream jobs at construction time,
    * and caller predicates do not push past the materialization boundary.
    * Only for relations that are bounded (dimension/model/snapshot-sized) —
    * never corpus-scale data, where recompute or exchange reuse is the
    * answer.
    */
  def materializeSmall(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** STAGE-LANDING materialization for a corpus-sized intermediate consumed
    * by several downstream stages of a composed pipeline (p8): one
    * distributed write of the curated relation instead of re-deriving the
    * whole upstream per consumer — the trade is one write + k reads versus
    * k full upstream recomputes, exactly the landing a production pipeline
    * does between stages.
    *
    * DURABLE by construction: the stage lands as a
    * [[graft.sources.Versioned.appendCommit]] table (a real distributed
    * parquet write + manifest), so the composed pipeline's fault story
    * matches its scan story — executor loss after a landing re-reads the
    * landed files instead of losing lineage-truncated checkpoint blocks
    * (`localCheckpoint`'s failure mode on a real cluster; and blocks
    * don't spill across jobs the way files trivially do at 100 TB). The
    * landing root is `spark.graft.stageDir` when set (a durable shared
    * path in production), a fresh temp directory otherwise. Each call
    * lands a NEW single-version table — stages are anonymous
    * intermediates, not evolving tables.
    */
  def materializeStage(df: DataFrame): DataFrame = materializeStageOwned(df)._1

  /** [[materializeStage]] returning the landed root too, for callers
    * that OWN the stage's lifetime: a REFRESH LOOP (the materialized
    * views) deletes its stages via [[dropStage]] once its commit has
    * published — otherwise a loop refreshing every few minutes grows the
    * stage volume without bound. One-shot pipelines may ignore the root
    * and leave cleanup to stageDir retention.
    */
  def materializeStageOwned(df: DataFrame): (DataFrame, String) = {
    val spark = df.sparkSession
    val base = spark.conf.getOption("spark.graft.stageDir")
    val root = base match {
      case Some(b) =>
        val d = new java.io.File(b, s"stage-${java.util.UUID.randomUUID().toString.take(12)}")
        d.mkdirs(); d.getAbsolutePath
      case None =>
        java.nio.file.Files.createTempDirectory("graft-stage-").toFile.getAbsolutePath
    }
    // a PLAIN parquet write, not a Versioned commit: the durability claim
    // needs only re-readable files (executor loss re-reads them — the
    // localCheckpoint contrast), while a stage is anonymous, single-writer
    // and refresh-scoped — the commit ceremony it would pay (per-file
    // sha256 content pooling, manifest + marker writes, schema JSON) is
    // pure write amplification on the view-refresh hot path (measured at
    // sf0.1: the r12 switch to committed stages cost p9/p9b/p12 ~7-20%;
    // this drops the ceremony while keeping the files)
    df.write.mode("errorifexists").parquet(s"$root/d")
    (spark.read.parquet(s"$root/d"), root)
  }

  /** Delete a stage landing created by [[materializeStageOwned]] — safe
    * only AFTER every consumer of the returned frame has executed (the
    * owning commit has published).
    */
  def dropStage(root: String): Unit = {
    def rec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
      f.delete(); ()
    }
    rec(new java.io.File(root))
  }
}
