package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the Prometheus text-exposition format — the
  * `spark.read.format(...)` face of [[graft.operators.Firehose.promParse]]
  * (same line grammar, same output columns), built on the connector API a
  * real file format plugs into: `TableProvider` → `Table`/`SupportsRead` →
  * `ScanBuilder` → `Batch` with one `InputPartition` PER FILE and a
  * file-local `PartitionReader` — scans parallelize across files with zero
  * driver involvement per row, the property that matters when a federation
  * dump is thousands of scrape files.
  *
  * Usage: `spark.read.format("graft.sources.PromTableProvider")
  * .load("/path/to/dir")` (reads every `*.prom`/`*.txt` file under the
  * path, or a single file). Comment (`#`) and blank lines are skipped, as
  * the exposition format requires.
  */
object PromSource {
  val Schema: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("series", StringType),
    StructField("value", DoubleType),
    StructField("ts_ms", LongType)))

  /** One exposition line → (metric, series, value, ts_ms); None for
    * comments/blanks. Mirrors the m21 expression semantics exactly:
    * series keeps the canonical `k=v,...` rendering with quotes stripped.
    */
  def parseLine(line: String): Option[(String, String, Double, Long)] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return None
    val parts = t.split(" ")
    if (parts.length < 3) return None
    val head = parts(0)
    val brace = head.indexOf('{')
    val metric = if (brace >= 0) head.substring(0, brace) else head
    val series =
      if (brace >= 0 && head.endsWith("}"))
        head.substring(brace + 1, head.length - 1).replace("\"", "")
      else ""
    try Some((metric, series, parts(1).toDouble, parts(2).toLong))
    catch { case _: NumberFormatException => None }
  }

  def listFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isFile) Seq(f.getAbsolutePath)
    else
      Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
        .filter(x => x.isFile &&
          (x.getName.endsWith(".prom") || x.getName.endsWith(".txt")))
        .map(_.getAbsolutePath).sorted
  }
}

class PromTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PromSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PromTable(properties.get("path"))
}

class PromTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"prom($path)"
  override def schema(): StructType = PromSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new PromScan(path)
    }
}

class PromScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = PromSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    PromSource.listFiles(path).map(PromInputPartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PromReaderFactory
}

case class PromInputPartition(file: String) extends InputPartition

class PromReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PromInputPartition].file
    new PartitionReader[InternalRow] {
      private val lines = scala.io.Source.fromFile(file, "UTF-8")
      private val it = lines.getLines().flatMap(PromSource.parseLine)
      private var current: (String, String, Double, Long) = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(current._1), UTF8String.fromString(current._2),
        current._3, current._4)
      override def close(): Unit = lines.close()
    }
  }
}
