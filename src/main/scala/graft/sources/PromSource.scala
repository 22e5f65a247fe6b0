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
  * Usage: `spark.read.format("prom").load("/path/to/dir")` (the short name
  * registers via `DataSourceRegister`; the full class name
  * `graft.sources.PromTableProvider` also works). Reads every
  * `*.prom`/`*.txt` file under the path, or a single file. Comment (`#`),
  * blank, and malformed lines are skipped, as a scraper does.
  */
object PromSource {
  val Schema: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("series", StringType),
    StructField("value", DoubleType),
    StructField("ts_ms", LongType)))

  // compiled once per JVM from the SAME grammar strings the expression
  // parser uses — the two readers cannot drift apart silently
  private val LinePattern =
    java.util.regex.Pattern.compile(graft.operators.Firehose.PromGrammar.LineRe)
  private val PairPattern =
    java.util.regex.Pattern.compile(graft.operators.Firehose.PromGrammar.PairRe)

  /** One exposition line → (metric, series, value, ts_ms-or-null); None for
    * comment/blank/malformed lines. Token-for-token the semantics of
    * [[graft.operators.Firehose.promParse]]: quoted label values may
    * contain spaces/commas/`}`, backslash escapes are unescaped (`\n` to a
    * real newline), a label block with residue between pairs is malformed,
    * `+Inf`/`-Inf`/`NaN` values parse, the series is the canonical
    * `k=v,...` rendering, and the timestamp is optional.
    */
  def parseLine(line: String): Option[(String, String, Double, java.lang.Long)] = {
    import graft.operators.Firehose.PromGrammar
    parseLinePlain(line).orElse {
      // OpenMetrics tolerance: exemplar tails drop, the sample stays —
      // same retry discipline as PromGrammar.parseLineLabels
      val stripped = PromGrammar.stripExemplarTail(line)
      if (stripped == line) None else parseLinePlain(stripped)
    }
  }

  private def parseLinePlain(
      line: String): Option[(String, String, Double, java.lang.Long)] = {
    import graft.operators.Firehose
    import Firehose.PromGrammar
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return None
    val m = LinePattern.matcher(t)
    if (!m.matches()) return None
    val block = Option(m.group(3)).getOrElse("")
    // metric + pairs resolution shared with every reader: classic form
    // tiles the whole block; the Prometheus 3.x quoted-name form takes
    // the block's first entry as the name — residue means a malformed
    // line, exactly like the expression parser's filters
    PromGrammar.metricAndPairs(m.group(1), block).flatMap {
      case (metric, pairsTxt) =>
        val series = {
          val sb = new StringBuilder
          val pm = PairPattern.matcher(pairsTxt)
          while (pm.find()) {
            if (sb.nonEmpty) sb.append(',')
            val (k, v) = PromGrammar.pairOf(pm)
            sb.append(Firehose.escapeSeriesPartStr(k)).append('=')
              .append(Firehose.escapeSeriesPartStr(v))
          }
          sb.toString
        }
        PromGrammar.parseDoubleToken(m.group(4)).flatMap { value =>
          try {
            val ts: java.lang.Long =
              if (m.group(6) == null) null
              else java.lang.Long.valueOf(m.group(6))
            Some((metric, series, value, ts))
          } catch { case _: NumberFormatException => None }
        }
    }
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

class PromTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  // resolved through the DataSourceRegister service file, so callers write
  // spark.read.format("prom") like any built-in format
  override def shortName(): String = "prom"
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
      private var current: (String, String, Double, java.lang.Long) = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(current._1), UTF8String.fromString(current._2),
        current._3,
        if (current._4 == null) null else current._4.longValue())
      override def close(): Unit = lines.close()
    }
  }
}
