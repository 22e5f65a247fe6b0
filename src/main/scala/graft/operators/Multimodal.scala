package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic STUB ([[stubDecode]]); everything around it
  * — schema, batch iteration shape, partition-parallel execution, output
  * schema declaration — is the real Spark plumbing a codec-backed
  * implementation would drop into.
  */
object Multimodal {

  /** documents → opaque binary payload + typed metadata (the landing shape
    * for image/audio/video blobs at 100 TB: payload stays a `binary` column,
    * metadata is columnar and prunable).
    */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      to_binary(col("text"), lit("utf-8")).as("payload"),
      lit("text/plain").as("mime"),
      col("source"),
      octet_length(to_binary(col("text"), lit("utf-8"))).cast("long").as("byte_len"))

  /** STUB decoder: stands in for an image/audio codec. Deterministic fake
    * "features" from the raw bytes (length, first, last, byte-sum mod 256).
    * A real deployment replaces ONLY this function body with e.g. a JNI
    * codec call; the batch shape stays.
    */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      sum += payload(i) & 0xff
      i += 1
    }
    Array(
      payload.length.toDouble,
      if (payload.isEmpty) 0.0 else (payload(0) & 0xff).toDouble,
      if (payload.isEmpty) 0.0 else (payload(payload.length - 1) & 0xff).toDouble,
      (sum % 256).toDouble)
  }

  /** Feature vector flattened to scalar columns: downstream-friendly (sortable,
    * hashable, columnar-prunable) and oracle-comparable, unlike an
    * `array<double>` payload.
    */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("f_len", DoubleType),
    StructField("f_first", DoubleType),
    StructField("f_last", DoubleType),
    StructField("f_sum_mod", DoubleType),
    StructField("n_bytes", LongType)))

  /** Per-binary feature extraction with `mapPartitions` — the batch-UDF
    * shape (one iterator per partition, zero driver involvement) that a
    * vectorized decode would use.
    */
  def extractFeatures(binaries: DataFrame): DataFrame = {
    val spark = binaries.sparkSession
    val rows = binaries.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val f = stubDecode(payload)
        Row(id, f(0), f(1), f(2), f(3), payload.length.toLong)
      }
    }
    spark.createDataFrame(rows, featureSchema)
  }
}
