package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's µs TimestampType
    * cannot hold natively; read it as nanos-since-epoch long and expose both
    * the raw nanos and a µs-truncated timestamp column. */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
}
