package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * A 100 TB table sorted on ONE column prunes scans only on that column — a
  * predicate on any other dimension touches every file. Interleaving the
  * bits of d bucketized dimensions into one Z-value and range-partitioning
  * + sorting by it gives every clustered dimension locality at once: each
  * file covers a contiguous Morton region, so its per-dimension min/max
  * footprint is a small block and a selective predicate on ANY clustered
  * column intersects only ~N^((d-1)/d) of N files (vs all N for the
  * unsorted dimensions of a linear sort). Pure column expressions — the
  * Z-value is codegen'd shift/or arithmetic, the stats pass is one tiny
  * aggregate, and the shuffle is the same range partitioner any global
  * sort uses.
  */
object Layout {

  /** Morton Z-value over `d` pre-bucketized dimensions: bit `i` of bucket
    * `j` lands at interleaved position `i·d + j`. Buckets must already be
    * in `[0, 2^bits)`; `bits · d` must fit a signed long.
    */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits * buckets.size <= 62,
      "need 1..d columns with bits*d <= 62")
    val d = buckets.size
    (0 until bits)
      .flatMap { i =>
        buckets.zipWithIndex.map { case (b, j) =>
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * d + j)
        }
      }
      .reduce(_ bitwiseOR _)
  }

  /** Uniform bucketization of a numeric column into `[0, 2^bits)` given its
    * min/max (`width_bucket` is 1-based and returns 0 / n+1 outside the
    * range — shift and clamp). Uniform buckets are the right default for
    * roughly-uniform dimensions; for heavy skew substitute approx-quantile
    * boundaries (one mergeable-sketch pass) and keep everything else.
    */
  def uniformBucket(c: Column, minV: Double, maxV: Double, bits: Int): Column = {
    val n = (1L << bits) - 1
    least(
      greatest(
        width_bucket(c.cast("double"), lit(minV), lit(maxV), lit(n.toInt)) - 1,
        lit(0L)),
      lit(n))
  }

  /** Z-order `df` by `cols` into `numFiles` range partitions, each sorted by
    * the Z-value (so parquet row-group stats are tight too). One tiny
    * stats aggregate for the per-column min/max, then a single range
    * shuffle — the same cost as one global sort.
    */
  def zorderBy(
      df: DataFrame,
      cols: Seq[String],
      numFiles: Int,
      bits: Int = 16): DataFrame = {
    val statAggs = cols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val stats = df.agg(statAggs.head, statAggs.tail: _*).head()
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      uniformBucket(col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bits)
    }
    df.withColumn("_z", zValue(buckets, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Land `df` z-ordered by `cols` at `dir`, plus the per-file min/max
    * footprint relation at `dir/_footprint` (underscore-prefixed, so data
    * readers ignore it exactly like `_SUCCESS`): one stats pass over the
    * landed files, one row per file per clustered column pair. The
    * footprint IS the skip index the read half prunes on — the same
    * file-stats idea Delta/Iceberg keep in their transaction logs,
    * expressed as a plain parquet relation.
    */
  def landZordered(
      df: DataFrame,
      cols: Seq[String],
      dir: String,
      numFiles: Int,
      bits: Int = 16): Unit = {
    zorderBy(df, cols, numFiles, bits).write.parquet(dir)
    val spark = df.sparkSession
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max"))
    }
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // one row per FILE — registry-sized by construction
      .write.mode("overwrite").parquet(s"$dir/_footprint")
  }

  /** The read half of z-order data skipping: filter the landed footprint
    * (a tiny scan — one row per file) to the files whose min/max block
    * intersects `[lo, hi]` on clustered column `c`, and hand ONLY those to
    * the parquet reader — the same skip Hive partition pruning gets from
    * directory structure, but available on EVERY clustered dimension at
    * once. The residual row filter is still applied, so results are
    * identical to a full scan + filter; the driver-side file list is
    * file-count-bounded (paths, not data). At 100 TB this is the
    * difference between listing 16 of 10,000 files and scanning them all.
    */
  def footprintPrunedRead(
      spark: SparkSession,
      dir: String,
      c: String,
      lo: Any,
      hi: Any): DataFrame =
    footprintPrunedRead(spark, dir, Seq((c, lo, hi)))

  /** Conjunctive form: a file survives only if its footprint block
    * intersects EVERY `(col, lo, hi)` range — z-order makes all clustered
    * dimensions prunable at once, so the skip sets multiply.
    */
  def footprintPrunedRead(
      spark: SparkSession,
      dir: String,
      preds: Seq[(String, Any, Any)]): DataFrame = {
    require(preds.nonEmpty, "need at least one (col, lo, hi) predicate")
    val fpFilter = preds.map { case (c, lo, hi) =>
      col(s"${c}__min") <= lit(hi) && col(s"${c}__max") >= lit(lo)
    }.reduce(_ && _)
    val rowFilter = preds.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    val files = spark.read.parquet(s"$dir/_footprint")
      .filter(fpFilter)
      .select("file").collect().map(_.getString(0))
    val base =
      if (files.isEmpty) spark.read.parquet(dir).filter(lit(false))
      else spark.read.option("basePath", dir).parquet(files.toIndexedSeq: _*)
    base.filter(rowFilter)
  }
}
