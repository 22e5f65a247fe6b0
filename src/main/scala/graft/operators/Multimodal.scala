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

  /** STUB frame extractor: stands in for a video demuxer. Deterministic
    * fake "frame" = the fixed-size byte slice at the frame's offset. A real
    * deployment replaces ONLY this function body with a demuxer/codec call;
    * the offsets, fan-out and batch shape stay.
    */
  def stubFrame(payload: Array[Byte], offset: Int, frameBytes: Int): Array[Byte] =
    payload.slice(offset, math.min(payload.length, offset + frameBytes))

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("frame_offset", LongType),
    StructField("frame_len", LongType),
    StructField("frame_sum_mod", DoubleType)))

  /** Frame sampling over "video" binaries: every `strideBytes`-th position
    * yields one frame row of `frameBytes` bytes (a real demuxer samples
    * every Nth frame the same way — fixed fan-out per payload, decode
    * stubbed). One row per FRAME, so the explode factor is
    * byte_len/strideBytes — bounded and predictable at 100 TB; the
    * per-frame summary keeps the output columnar instead of shipping raw
    * frame bytes downstream.
    */
  def sampleFrames(
      binaries: DataFrame,
      frameBytes: Int = 16,
      strideBytes: Int = 64): DataFrame = {
    require(frameBytes > 0 && strideBytes > 0, "need positive frame/stride")
    val spark = binaries.sparkSession
    val rows = binaries.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val nFrames = if (payload.length == 0) 0 else (payload.length - 1) / strideBytes + 1
        (0 until nFrames).iterator.map { k =>
          val off = k * strideBytes
          val frame = stubFrame(payload, off, frameBytes)
          var sum = 0L
          var i = 0
          while (i < frame.length) { sum += frame(i) & 0xff; i += 1 }
          Row(id, k.toLong, off.toLong, frame.length.toLong, (sum % 256).toDouble)
        }
      }
    }
    spark.createDataFrame(rows, frameSchema)
  }
}
