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

  // ---- real audio decode (mm4): the one multimodal path whose decoder is
  // NOT a stub — a format-real RIFF/WAVE PCM parser. The container ships no
  // media files, so the PAYLOADS are materialized from the text corpus by
  // [[encodeWavPcm16]] (a real WAV writer — any standards-compliant reader
  // opens its output); the DECODER below is independent of that writer and
  // handles any 16-bit PCM WAV (chunk iteration, odd-size padding, fmt
  // fields honored, RMS over the actual PCM samples).

  /** Deterministic PCM track for a document: one signed 16-bit sample per
    * code point, `((cp % 256) - 128) * 256` — mirrored code-point-for-code-
    * point by the DuckDB oracle's `ord(substr(text, i, 1))` arithmetic, so
    * decoded sample counts and RMS are byte-checkable without a codec.
    */
  def textToSamples(text: String): Array[Short] = {
    val out = new Array[Short](text.codePointCount(0, text.length))
    var i = 0
    var k = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      out(k) = (((cp % 256) - 128) * 256).toShort
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Canonical-layout mono 16-bit PCM WAV writer (44-byte RIFF header +
    * s16le data chunk).
    */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Decoded WAV properties: true header fields + signal stats computed
    * from the PCM data chunk.
    */
  final case class WavMeta(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      nSamples: Long,
      durationSec: Double,
      rms: Double)

  /** REAL WAV decoder: validates the RIFF magic and WAVE form type, walks
    * the chunk list (word-aligned, as the format requires — unknown chunks
    * are skipped, not assumed absent), reads the fmt fields little-endian,
    * and computes sample count, duration and RMS from the actual PCM
    * payload. Returns None for anything malformed (truncated header, wrong
    * magic, missing fmt/data, non-PCM, unsupported bit depth) — the
    * skip-and-continue discipline every other decoder path here follows.
    * Supports 16-bit PCM, any channel count (RMS over all interleaved
    * samples).
    */
  def decodeWavPcm16(payload: Array[Byte]): Option[WavMeta] = {
    if (payload.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4)
      bb.get(b)
      new String(b, "US-ASCII")
    }
    if (fourcc() != "RIFF") return None
    bb.getInt // declared RIFF size (not trusted over the actual buffer)
    if (fourcc() != "WAVE") return None
    var audioFormat = -1
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (bb.remaining() >= 8 && (dataOff < 0 || audioFormat < 0)) {
      val id = fourcc()
      val size = bb.getInt
      if (size < 0 || size > bb.remaining()) return None // truncated chunk
      val bodyPos = bb.position()
      id match {
        case "fmt " =>
          if (size < 16) return None
          audioFormat = bb.getShort & 0xffff
          channels = bb.getShort & 0xffff
          sampleRate = bb.getInt
          bb.getInt // byte rate (derivable)
          bb.getShort // block align (derivable)
          bits = bb.getShort & 0xffff
        case "data" =>
          dataOff = bodyPos
          dataLen = size
        case _ => () // unknown chunk (LIST, fact, ...): skip
      }
      bb.position(bodyPos + size + (size & 1)) // chunks are word-aligned
    }
    if (audioFormat != 1 || bits != 16 || channels < 1 || sampleRate <= 0 ||
      dataOff < 0) return None
    val n = (dataLen / 2).toLong // total s16 samples across channels
    var ss = 0L // sum of squares: |s| <= 2^15 so n <= 2^22 TB-of-audio fits a long
    var i = 0
    while (i < n) {
      val off = dataOff + i * 2
      val s = (((payload(off + 1) << 8) | (payload(off) & 0xff)).toShort).toInt
      ss += s.toLong * s
      i += 1
    }
    val framesPerChannel = n / channels
    Some(WavMeta(
      channels, sampleRate, bits, n,
      framesPerChannel.toDouble / sampleRate,
      if (n == 0) 0.0 else math.sqrt(ss.toDouble / n)))
  }

  /** documents → genuine WAV binary payloads (8 kHz mono 16-bit PCM from
    * [[textToSamples]]) — the audio-landing shape: payload is an opaque
    * `binary` column, everything else columnar.
    */
  def asWav(docs: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val rows = docs.select(col("doc_id"), col("text")).rdd.mapPartitions { it =>
      it.map { r =>
        Row(r.getLong(0), encodeWavPcm16(textToSamples(r.getString(1)), sampleRate))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  val wavFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("channels", LongType),
    StructField("sample_rate", LongType),
    StructField("bits", LongType),
    StructField("n_samples", LongType),
    StructField("duration_sec", DoubleType),
    StructField("rms", DoubleType)))

  /** WAV feature extraction in the same `mapPartitions` batch shape as
    * [[extractFeatures]], but with the REAL decoder: every output value is
    * a true decoded property of the binary payload (header fields read
    * little-endian from the fmt chunk; duration and RMS computed from the
    * PCM data). Malformed payloads are dropped, not nulled.
    */
  def wavFeatures(binaries: DataFrame): DataFrame = {
    val spark = binaries.sparkSession
    val rows = binaries.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        decodeWavPcm16(r.getAs[Array[Byte]](1)).map { m =>
          Row(r.getLong(0), m.channels.toLong, m.sampleRate.toLong,
            m.bitsPerSample.toLong, m.nSamples, m.durationSec, m.rms)
        }
      }
    }
    spark.createDataFrame(rows, wavFeatureSchema)
  }

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
