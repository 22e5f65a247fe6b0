package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance for the streaming landing area.
  *
  * The exactly-once file sink writes at least one file per partition per
  * micro-batch, so a long-running firehose landing
  * ([[graft.streaming.FirehoseStream.landingSink]]) rots into millions of
  * tiny parquet files — the classic small-file problem that dominates scan
  * cost at 100 TB (footer reads and task scheduling, not bytes).
  */
object Landing {

  /** Compaction result: what was read and what was written. */
  final case class CompactionStats(
      inputFiles: Long, inputBytes: Long, outputFiles: Long, rows: Long)

  /** Rewrite a hive-partitioned parquet directory into ~`targetFileBytes`
    * files per partition directory. Rows are repartitioned by the partition
    * columns (one shuffle whose write side is the new file layout) and the
    * per-file row bound is derived from the observed average row size, so
    * output files land near the target regardless of schema width.
    *
    * Writes to `outPath` — the swap into place is the caller's move (object
    * stores make directory swaps non-atomic; a production pipeline swaps a
    * table/view pointer instead).
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      partitionCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    val df = spark.read.parquet(inPath)
    val files = df.inputFiles
    val fs = new Path(inPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inputBytes = files.map(f => fs.getFileStatus(new Path(f)).getLen).sum
    val rows = df.count()
    val avgRowBytes = math.max(1L, if (rows == 0) 1L else inputBytes / rows)
    val maxRecordsPerFile = math.max(1L, targetFileBytes / avgRowBytes)
    df.repartition(partitionCols.map(col): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(outPath)
    val outFiles = spark.read.parquet(outPath).inputFiles.length.toLong
    CompactionStats(files.length.toLong, inputBytes, outFiles, rows)
  }
}
