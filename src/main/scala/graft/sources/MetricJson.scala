package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.FirehoseMetric

/** JSON-line decoding of the metrics firehose.
  *
  * Reference parity: AbstractFirehose.java:100-107 parses each Kafka record
  * with Jackson and silently skips malformed records
  * (AbstractFirehose.java:118-126 catches and logs). Here the whole batch is
  * parsed by a single codegen'd `from_json` expression; malformed rows
  * null-out and are dropped, giving the same skip semantics without a
  * per-record interpreter loop.
  */
object MetricJson {

  /** Parse a column of metric JSON lines into flattened metric columns.
    * Works identically on batch and streaming DataFrames.
    *
    * `strict = true` (default for external input) drops malformed rows.
    * The filter carries an always-false nondeterministic disjunct: a plain
    * deterministic predicate gets pushed below the parse projection (and
    * below any repartition) with `from_json` inlined, making the whole
    * parse run twice — once in the pushed filter's stage and once in the
    * projection. (`rand() > 2` doesn't survive: Spark 4 folds it via rand's
    * known range; `uuid() = ''` does.) Set `strict = false` for trusted
    * in-engine input where malformed rows are impossible.
    */
  def parse(lines: DataFrame, jsonCol: String = "value", strict: Boolean = true): DataFrame = {
    val parsed = lines
      .withColumn("_metric", from_json(col(jsonCol), FirehoseMetric.schema))
      .select(col("_metric.*"))
    if (strict) {
      parsed.filter(
        (col("id").isNotNull && col("name").isNotNull) || expr("uuid()") === lit(""))
    } else parsed
  }

  /** Typed variant. */
  def parseTyped(lines: DataFrame, jsonCol: String = "value"): Dataset[FirehoseMetric] = {
    val spark = lines.sparkSession
    import spark.implicits._
    parse(lines, jsonCol).as[FirehoseMetric]
  }

  /** Read a directory/file of metric JSON lines (the batch "landed firehose"
    * path; same parser the streaming source uses).
    */
  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path), "value")
}
