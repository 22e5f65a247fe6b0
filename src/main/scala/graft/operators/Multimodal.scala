package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: opaque `binary` payloads + typed metadata, with
  * REAL format-level decoders for every registered query path.
  *
  * The container ships no media files, so payloads are materialized from
  * the text corpus by format-real WRITERS (WAV/BMP/AVI — any
  * standards-compliant reader opens their output); the DECODERS are
  * independent chunk/header parsers that handle arbitrary conformant
  * input, spec'd against hand-assembled exotic layouts. The two
  * decode-free operators ([[binaryMeta]], [[samplePages]]) are honest
  * LAYOUT ops — byte-level sniffing and fixed-stride page sampling —
  * not decoders.
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

  /** documents → a MIXED-modality binary landing: each doc materializes as
    * a genuine container payload chosen by `doc_id mod 3` (RIFF/WAVE PCM,
    * 24-bit BMP, raw UTF-8 bytes) — the real shape of a multimodal landing
    * zone, where one `binary` column carries heterogeneous formats and
    * nothing downstream may trust upstream metadata about what's inside.
    */
  def asMixed(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("source", StringType)))
    val rows = graft.Tables.widen(docs.select(col("doc_id"), col("text"), col("source")))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val payload = (id % 3) match {
            case 0 => encodeWavPcm16(textToSamples(text), 8000)
            case 1 => encodeBmp24(textToPixels(text), 32)
            case _ => text.getBytes("UTF-8")
          }
          Row(id, payload, r.getString(2))
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Typed metadata with magic-byte format SNIFFING — the first gate of any
    * multimodal ingest: the mime is READ from the payload's own bytes
    * (`RIFF….WAVE` → audio/x-wav, `BM` → image/bmp, else octet-stream),
    * never trusted from upstream columns. Pure codegen'd byte inspection
    * (`substring` on the binary + hex compare) over the scan — no UDF, no
    * shuffle, and only the 12-byte prefix of each payload is examined.
    */
  def binaryMeta(binaries: DataFrame): DataFrame = {
    val isWav =
      (octet_length(col("payload")) >= 12) &&
        (hex(substring(col("payload"), 1, 4)) === "52494646") && // "RIFF"
        (hex(substring(col("payload"), 9, 4)) === "57415645") // "WAVE"
    val isBmp =
      (octet_length(col("payload")) >= 2) &&
        (hex(substring(col("payload"), 1, 2)) === "424D") // "BM"
    binaries.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      when(isWav, lit("audio/x-wav"))
        .when(isBmp, lit("image/bmp"))
        .otherwise(lit("application/octet-stream")).as("mime"),
      col("source"))
  }

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

  /** Parsed WAV container layout: fmt fields + the data chunk's extent. */
  private[graft] final case class WavLayout(
      channels: Int,
      sampleRate: Int,
      bits: Int,
      dataOff: Int,
      dataLen: Int)

  /** REAL WAV container parse: validates the RIFF magic and WAVE form type,
    * walks the chunk list (word-aligned, as the format requires — unknown
    * chunks are skipped, not assumed absent), and reads the fmt fields
    * little-endian. Returns None for anything malformed (truncated header,
    * wrong magic, missing fmt/data, non-PCM, unsupported bit depth) — the
    * skip-and-continue discipline every decoder path here follows. 16-bit
    * PCM only, any channel count.
    */
  private[graft] def parseWavLayout(payload: Array[Byte]): Option[WavLayout] = {
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
    Some(WavLayout(channels, sampleRate, bits, dataOff, dataLen))
  }

  /** The interleaved s16 sample at index `i` of the parsed data chunk. */
  @inline private def sampleAt(payload: Array[Byte], dataOff: Int, i: Long): Int = {
    val off = dataOff + (i * 2).toInt
    (((payload(off + 1) << 8) | (payload(off) & 0xff)).toShort).toInt
  }

  /** REAL WAV decoder: [[parseWavLayout]] + sample count, duration and RMS
    * computed from the actual PCM payload (RMS over all interleaved
    * samples).
    */
  def decodeWavPcm16(payload: Array[Byte]): Option[WavMeta] =
    parseWavLayout(payload).map { lay =>
      val n = (lay.dataLen / 2).toLong // total s16 samples across channels
      var ss = 0L // sum of squares: |s| <= 2^15 so n <= 2^22 TB-of-audio fits a long
      var i = 0L
      while (i < n) {
        val s = sampleAt(payload, lay.dataOff, i)
        ss += s.toLong * s
        i += 1
      }
      val framesPerChannel = n / lay.channels
      WavMeta(
        lay.channels, lay.sampleRate, lay.bits, n,
        framesPerChannel.toDouble / lay.sampleRate,
        if (n == 0) 0.0 else math.sqrt(ss.toDouble / n))
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
    // widen: the encode+downstream-decode chain is the CPU-heavy stage;
    // a single-split input (the testdata shape) would serialize it
    val rows = graft.Tables.widen(docs.select(col("doc_id"), col("text")))
      .rdd.mapPartitions { it =>
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

  val signalFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_samples", LongType),
    StructField("f_duration", DoubleType),
    StructField("f_rms", DoubleType),
    StructField("f_peak", DoubleType),
    StructField("n_zero_cross", LongType)))

  /** Per-binary FEATURE-VECTOR extraction with the REAL decoder — the
    * downstream-ML shape (one feature row per payload, scalar columns so
    * everything stays sortable/hashable/prunable) in the `mapPartitions`
    * batch form a vectorized codec would use: one iterator per partition,
    * zero driver involvement, raw bytes never shipped past this operator.
    * Every feature is a true signal statistic of the decoded PCM samples:
    * duration, RMS, peak amplitude, and the zero-crossing count (an exact
    * integer — the standard cheap voicing/noisiness signal). Malformed
    * payloads are dropped, not nulled.
    */
  def wavSignalFeatures(binaries: DataFrame): DataFrame = {
    val spark = binaries.sparkSession
    val rows = binaries.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val payload = r.getAs[Array[Byte]](1)
        parseWavLayout(payload).map { lay =>
          val n = (lay.dataLen / 2).toLong
          var ss = 0L
          var peak = 0
          var zc = 0L
          var prev = 0
          var i = 0L
          while (i < n) {
            val s = sampleAt(payload, lay.dataOff, i)
            ss += s.toLong * s
            val a = math.abs(s)
            if (a > peak) peak = a
            if (i > 0 && s.toLong * prev < 0) zc += 1
            prev = s
            i += 1
          }
          Row(r.getLong(0), n,
            (n / lay.channels).toDouble / lay.sampleRate,
            if (n == 0) 0.0 else math.sqrt(ss.toDouble / n),
            peak.toDouble, zc)
        }
      }
    }
    spark.createDataFrame(rows, signalFeatureSchema)
  }

  // ---- real image decode (mm5): the image-modality sibling of the WAV
  // path — genuine 24-bit BMP payloads (written from the corpus by a
  // format-real encoder) decoded by a real header/pixel-array parser that
  // honors the details a fake would skip: 4-byte row padding, bottom-up vs
  // top-down orientation (height sign), BI_RGB-only compression, declared
  // pixel-offset indirection.

  /** One 8-bit luminance pixel per code point (`cp % 256`) — the DuckDB
    * oracle mirrors it with `ord(substr(text, i, 1)) % 256`.
    */
  def textToPixels(text: String): Array[Int] = {
    val out = new Array[Int](text.codePointCount(0, text.length))
    var i = 0
    var k = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      out(k) = cp % 256
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** 24-bit bottom-up BI_RGB BMP writer: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + padded pixel rows (B=G=R=luminance). Fixed width;
    * height grows with the payload, the final row zero-padded.
    */
  def encodeBmp24(pixels: Array[Int], width: Int): Array[Byte] = {
    require(width > 0, "need positive width")
    val height = math.max(1, (pixels.length + width - 1) / width)
    val rowBytes = width * 3
    val stride = (rowBytes + 3) & ~3
    val dataSize = stride * height
    val buf = java.nio.ByteBuffer
      .allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putInt(0) // reserved
    buf.putInt(54) // pixel data offset
    buf.putInt(40) // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height) // positive = bottom-up
    buf.putShort(1) // planes
    buf.putShort(24) // bpp
    buf.putInt(0) // BI_RGB
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0) // palette sizes
    var r = height - 1
    while (r >= 0) { // bottom row first
      var x = 0
      while (x < width) {
        val idx = r * width + x
        val v = (if (idx < pixels.length) pixels(idx) else 0).toByte
        buf.put(v).put(v).put(v) // B G R
        x += 1
      }
      var p = rowBytes
      while (p < stride) { buf.put(0.toByte); p += 1 }
      r -= 1
    }
    buf.array()
  }

  /** Decoded BMP properties: true header fields + luminance statistics
    * computed from the pixel array.
    */
  final case class BmpMeta(
      width: Int,
      height: Int,
      bpp: Int,
      nPixels: Long,
      meanLum: Double)

  /** REAL BMP decoder: validates the BM magic, reads the declared pixel
    * offset, parses BITMAPINFOHEADER fields little-endian, rejects
    * non-BI_RGB / non-24bpp / truncated payloads, honors the 4-byte row
    * stride and both orientations (negative height = top-down), and
    * computes mean luminance from the actual channel bytes.
    */
  def decodeBmp(payload: Array[Byte]): Option[BmpMeta] = {
    if (payload.length < 54) return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bb.get() != 'B'.toByte || bb.get() != 'M'.toByte) return None
    bb.getInt // declared file size (not trusted over the buffer)
    bb.getInt // reserved
    val pixelOffset = bb.getInt
    val headerSize = bb.getInt
    if (headerSize < 40) return None // BITMAPCOREHEADER not supported
    val width = bb.getInt
    val rawHeight = bb.getInt
    val planes = bb.getShort & 0xffff
    val bpp = bb.getShort & 0xffff
    val compression = bb.getInt
    if (width <= 0 || rawHeight == 0 || planes != 1 || bpp != 24 ||
      compression != 0) return None
    val height = math.abs(rawHeight)
    val stride = (width * 3 + 3) & ~3
    if (pixelOffset < 54 || pixelOffset.toLong + stride.toLong * height >
      payload.length) return None // truncated pixel array
    var channelSum = 0L
    var r = 0
    while (r < height) {
      val rowStart = pixelOffset + r * stride
      var x = 0
      while (x < width) {
        val o = rowStart + x * 3
        channelSum += (payload(o) & 0xff) + (payload(o + 1) & 0xff) +
          (payload(o + 2) & 0xff)
        x += 1
      }
      r += 1
    }
    val nPixels = width.toLong * height
    Some(BmpMeta(width, height, bpp, nPixels,
      channelSum.toDouble / (3.0 * nPixels)))
  }

  /** documents → genuine 24-bit BMP binary payloads (fixed-width grayscale
    * bitmaps from [[textToPixels]]).
    */
  def asBmp(docs: DataFrame, width: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val rows = graft.Tables.widen(docs.select(col("doc_id"), col("text")))
      .rdd.mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0), encodeBmp24(textToPixels(r.getString(1)), width))
        }
      }
    spark.createDataFrame(rows, schema)
  }

  val bmpFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("bpp", LongType),
    StructField("n_pixels", LongType),
    StructField("mean_lum", DoubleType)))

  /** BMP feature extraction in the mm2 `mapPartitions` batch shape with the
    * REAL decoder; malformed payloads are dropped, not nulled.
    */
  def bmpFeatures(binaries: DataFrame): DataFrame = {
    val spark = binaries.sparkSession
    val rows = binaries.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        decodeBmp(r.getAs[Array[Byte]](1)).map { m =>
          Row(r.getLong(0), m.width.toLong, m.height.toLong, m.bpp.toLong,
            m.nPixels, m.meanLum)
        }
      }
    }
    spark.createDataFrame(rows, bmpFeatureSchema)
  }

  // ---- real PNG codec (mm7): the compressed-image sibling next to BMP —
  // genuine PNGs (signature, CRC-verified chunks, zlib IDAT, per-row
  // filters) written and read with the JVM's own Deflater/Inflater. The
  // writer cycles through ALL FIVE filter types row-by-row, so a single
  // round-trip exercises every unfilter path; third-party PNGs (e.g.
  // ImageIO's adaptive-filter encoder) decode through the same paths.

  private def crc32(bytes: Array[Byte], from: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(bytes, from, len)
    c.getValue.toInt
  }

  /** Genuine 8-bit grayscale PNG writer: IHDR + one zlib IDAT + IEND,
    * CRC-correct; row r uses filter type `r % 5` (None/Sub/Up/Average/
    * Paeth in rotation). Fixed width; height grows with the payload, the
    * final row zero-padded — the [[encodeBmp24]] layout convention.
    */
  def encodePng(pixels: Array[Int], width: Int): Array[Byte] = {
    require(width > 0, "need positive width")
    val height = math.max(1, (pixels.length + width - 1) / width)
    def px(r: Int, x: Int): Int = {
      val i = r * width + x
      if (i < pixels.length) pixels(i) & 0xff else 0
    }
    // filtered scanlines: 1 filter byte + width bytes per row
    val raw = new Array[Byte]((1 + width) * height)
    var r = 0
    while (r < height) {
      val ft = r % 5
      raw(r * (width + 1)) = ft.toByte
      var x = 0
      while (x < width) {
        val cur = px(r, x)
        val a = if (x > 0) px(r, x - 1) else 0
        val b = if (r > 0) px(r - 1, x) else 0
        val c = if (x > 0 && r > 0) px(r - 1, x - 1) else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 => cur - paethPredict(a, b, c)
        }
        raw(r * (width + 1) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      r += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = comp.toByteArray
    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12 + idat.length + 12)
    out.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(typ: String, body: Array[Byte]): Unit = {
      out.putInt(body.length)
      val start = out.position()
      out.put(typ.getBytes("US-ASCII")); out.put(body)
      out.putInt(crc32(out.array(), start, 4 + body.length))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width); ihdr.putInt(height)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(0.toByte)  // color type: grayscale
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", idat)
    chunk("IEND", Array.empty)
    out.array()
  }

  private def paethPredict(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  final case class PngMeta(
      width: Int,
      height: Int,
      bitDepth: Int,
      colorType: Int,
      nPixels: Long,
      meanLum: Double)

  /** REAL PNG decoder: signature + chunk walk with CRC VERIFICATION on
    * every chunk, IHDR validation (8-bit depth, grayscale or truecolor,
    * no interlace), multi-IDAT zlib inflate to the exact filtered-stream
    * length, and full unfiltering of all five PNG filter types
    * (None/Sub/Up/Average/Paeth, the byte arithmetic of RFC 2083 §6).
    * Mean luminance over the reconstructed channel bytes. Malformed
    * payloads (bad magic, truncated, CRC mismatch, unsupported layout,
    * short pixel stream) decode to None, never garbage.
    */
  def decodePng(payload: Array[Byte]): Option[PngMeta] = {
    if (payload.length < 8 + 12 + 13) return None
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if (payload(i) != sig(i)) return None; i += 1 }
    val bb = java.nio.ByteBuffer.wrap(payload)
    bb.position(8)
    var width = -1; var height = -1; var bitDepth = -1; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (bb.remaining() < 12) return None
      val len = bb.getInt
      // length arithmetic in Long: a crafted len near Int.MaxValue must
      // fail THIS check, not overflow into a passing one and throw on
      // the buffer positioning below
      if (len < 0 || bb.remaining().toLong < len.toLong + 8L) return None
      val typStart = bb.position()
      val typ = new String(payload, typStart, 4, "US-ASCII")
      bb.position(typStart + 4)
      val bodyStart = bb.position()
      bb.position(bodyStart + len)
      val crc = bb.getInt
      if (crc != crc32(payload, typStart, 4 + len)) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          val h = java.nio.ByteBuffer.wrap(payload, bodyStart, 13)
          width = h.getInt; height = h.getInt
          bitDepth = h.get() & 0xff; colorType = h.get() & 0xff
          val compression = h.get() & 0xff
          val filterMethod = h.get() & 0xff
          val interlace = h.get() & 0xff
          if (width <= 0 || height <= 0 || bitDepth != 8 ||
            (colorType != 0 && colorType != 2) ||
            compression != 0 || filterMethod != 0 || interlace != 0) return None
        case "IDAT" => idat.write(payload, bodyStart, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped (CRC already verified)
      }
    }
    if (width < 0 || idat.size() == 0) return None
    val bpp = if (colorType == 0) 1 else 3
    // dimension arithmetic must not overflow even in LONG: width and
    // height are each up to 2^31-1, so rowLenL * height can exceed 2^63
    // and wrap past a plain `> Int.MaxValue` check — bound by division
    // first (rowLenL itself is ≤ 3·(2^31-1), always exact)
    val rowLenL = width.toLong * bpp
    if (rowLenL > Int.MaxValue.toLong / height) return None
    // now rowLenL·height ≤ Int.MaxValue, so this product fits in Long
    val expected = (rowLenL + 1L) * height
    if (expected > Int.MaxValue) return None
    // zlib expands at most ~1032:1 — a tiny IDAT declaring huge
    // dimensions is malformed, and must take the None path BEFORE the
    // allocation (a ~100-byte payload must never force a ~2 GB buffer)
    if (expected > idat.size().toLong * 1032L + 64L) return None
    val rowLen = rowLenL.toInt
    val raw = new Array[Byte](expected.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // short stream
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (off != raw.length) return None
    // unfilter in place into the reconstructed channel stream
    val recon = new Array[Int](rowLen * height)
    var r = 0
    while (r < height) {
      val ft = raw(r * (rowLen + 1)) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < rowLen) {
        val f = raw(r * (rowLen + 1) + 1 + x) & 0xff
        val a = if (x >= bpp) recon(r * rowLen + x - bpp) else 0
        val b = if (r > 0) recon((r - 1) * rowLen + x) else 0
        val c = if (x >= bpp && r > 0) recon((r - 1) * rowLen + x - bpp) else 0
        val v = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + ((a + b) >> 1)
          case 4 => f + paethPredict(a, b, c)
        }
        recon(r * rowLen + x) = v & 0xff
        x += 1
      }
      r += 1
    }
    var sum = 0L
    var k = 0
    while (k < recon.length) { sum += recon(k); k += 1 }
    Some(PngMeta(width, height, bitDepth, colorType,
      width.toLong * height, sum.toDouble / recon.length))
  }

  /** documents → genuine grayscale PNG payloads. */
  def asPng(docs: DataFrame, width: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val rows = graft.Tables.widen(docs.select(col("doc_id"), col("text")))
      .rdd.mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0), encodePng(textToPixels(r.getString(1)), width))
        }
      }
    spark.createDataFrame(rows, schema)
  }

  val pngFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("bit_depth", LongType),
    StructField("color_type", LongType),
    StructField("n_pixels", LongType),
    StructField("mean_lum", DoubleType)))

  /** PNG feature extraction in the mm2 `mapPartitions` batch shape with
    * the REAL decoder; malformed payloads are dropped, not nulled.
    */
  def pngFeatures(binaries: DataFrame): DataFrame = {
    val spark = binaries.sparkSession
    val rows = binaries.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        decodePng(r.getAs[Array[Byte]](1)).map { m =>
          Row(r.getLong(0), m.width.toLong, m.height.toLong, m.bitDepth.toLong,
            m.colorType.toLong, m.nPixels, m.meanLum)
        }
      }
    }
    spark.createDataFrame(rows, pngFeatureSchema)
  }

  // ---- real video demux (mm6): the video-modality sibling — genuine AVI
  // containers (RIFF form 'AVI ': LIST/hdrl with an avih main header,
  // LIST/movi with one '00db' DIB chunk per frame) demuxed by a real
  // nested-RIFF walker. Frame pixel content pages through the document's
  // luminance stream, so every demuxed frame stat is byte-checkable.

  /** Genuine uncompressed AVI writer: 25 fps, `width`x`height` 24-bit DIB
    * frames, frame f = pixels [f*W*H, (f+1)*W*H) of the luminance stream
    * (final frame zero-padded), bottom-up rows like any DIB.
    */
  def encodeAvi(pixels: Array[Int], width: Int = 8, height: Int = 8): Array[Byte] = {
    require(width > 0 && height > 0, "need positive frame dims")
    val perFrame = width * height
    val nFrames = math.max(1, (pixels.length + perFrame - 1) / perFrame)
    val stride = (width * 3 + 3) & ~3
    val frameBytes = stride * height
    val microSecPerFrame = 40000 // 25 fps
    // sizes: avih body 56; strh body 56; strf body 40
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = java.nio.ByteBuffer
      .allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    cc("RIFF"); buf.putInt(riffSize); cc("AVI ")
    cc("LIST"); buf.putInt(hdrlSize); cc("hdrl")
    cc("avih"); buf.putInt(56)
    buf.putInt(microSecPerFrame).putInt(0).putInt(0).putInt(0)
    buf.putInt(nFrames).putInt(0).putInt(1).putInt(frameBytes)
    buf.putInt(width).putInt(height)
    buf.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    cc("LIST"); buf.putInt(strlSize); cc("strl")
    cc("strh"); buf.putInt(56)
    cc("vids"); cc("DIB ")
    buf.putInt(0).putShort(0).putShort(0).putInt(0)
    buf.putInt(1).putInt(25) // scale/rate = 25 fps
    buf.putInt(0).putInt(nFrames).putInt(frameBytes).putInt(-1).putInt(0)
    buf.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    cc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    buf.putInt(0).putInt(frameBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    cc("LIST"); buf.putInt(moviSize); cc("movi")
    var f = 0
    while (f < nFrames) {
      cc("00db"); buf.putInt(frameBytes)
      var r = height - 1
      while (r >= 0) { // bottom-up rows
        var x = 0
        while (x < width) {
          val idx = f * perFrame + r * width + x
          val v = (if (idx < pixels.length) pixels(idx) else 0).toByte
          buf.put(v).put(v).put(v)
          x += 1
        }
        var p = width * 3
        while (p < stride) { buf.put(0.toByte); p += 1 }
        r -= 1
      }
      f += 1
    }
    buf.array()
  }

  /** One demuxed frame: index, byte extent in the container, and the mean
    * luminance of its actual channel bytes.
    */
  final case class AviFrame(
      frameIdx: Int,
      offset: Int,
      nBytes: Int,
      meanLum: Double)

  final case class AviMeta(
      width: Int,
      height: Int,
      fps: Double,
      declaredFrames: Int,
      frames: Seq[AviFrame])

  /** REAL AVI demuxer: validates the RIFF/'AVI ' form, walks nested LISTs
    * (word-aligned, unknown chunks skipped), reads avih little-endian
    * (µs/frame → fps, dims, declared frame count), requires a 24bpp BI_RGB
    * strf, and yields one entry per '..db'/'..dc' chunk inside LIST/movi
    * with stats computed from the frame's channel bytes (stride-aware).
    * None for malformed containers.
    */
  def demuxAvi(payload: Array[Byte]): Option[AviMeta] = {
    if (payload.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4)
      bb.get(b)
      new String(b, "US-ASCII")
    }
    if (fourcc() != "RIFF") return None
    bb.getInt
    if (fourcc() != "AVI ") return None
    var usPerFrame = -1
    var declared = -1
    var width = -1
    var height = -1
    var bpp = -1
    var compression = -1
    val frames = Seq.newBuilder[AviFrame]
    var frameIdx = 0
    def frameMean(off: Int, len: Int): Double = {
      // stride-aware: only the width*3 channel bytes per row count
      val stride = (width * 3 + 3) & ~3
      val rows = if (stride > 0) len / stride else 0
      var sum = 0L
      var n = 0L
      var r = 0
      while (r < rows) {
        var i = 0
        while (i < width * 3) { sum += payload(off + r * stride + i) & 0xff; i += 1; n += 1 }
        r += 1
      }
      if (n == 0) 0.0 else sum.toDouble / n
    }
    def walk(end: Int, inMovi: Boolean): Boolean = { // false = malformed
      while (bb.position() + 8 <= end) {
        val id = fourcc()
        val size = bb.getInt
        if (size < 0 || bb.position() + size > end) return false
        val bodyPos = bb.position()
        id match {
          case "LIST" =>
            if (size < 4) return false
            val listType = fourcc()
            if (!walk(bodyPos + size, inMovi || listType == "movi")) return false
          case "avih" =>
            if (size < 40) return false
            usPerFrame = bb.getInt
            bb.getInt; bb.getInt; bb.getInt
            declared = bb.getInt
            bb.getInt; bb.getInt; bb.getInt
            width = bb.getInt
            height = bb.getInt
          case "strf" =>
            if (size < 20) return false
            bb.getInt; bb.getInt; bb.getInt; bb.getShort
            bpp = bb.getShort & 0xffff
            compression = bb.getInt
          case _ =>
            if (inMovi && id.length == 4 && id(2) == 'd' &&
              (id(3) == 'b' || id(3) == 'c')) {
              frames += AviFrame(frameIdx, bodyPos, size, frameMean(bodyPos, size))
              frameIdx += 1
            } // else: unknown chunk (strh, idx1, JUNK, ...) — skip
        }
        bb.position(bodyPos + size + (size & 1)) // word alignment
      }
      true
    }
    if (!walk(payload.length, inMovi = false)) return None
    if (usPerFrame <= 0 || width <= 0 || height <= 0 || bpp != 24 ||
      compression != 0 || declared < 0) return None
    Some(AviMeta(width, height, 1e6 / usPerFrame, declared, frames.result()))
  }

  /** documents → genuine AVI binary payloads (8x8 24-bit DIB frames paging
    * through the luminance stream at 25 fps).
    */
  def asAvi(docs: DataFrame, width: Int = 8, height: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val rows = graft.Tables.widen(docs.select(col("doc_id"), col("text")))
      .rdd.mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0), encodeAvi(textToPixels(r.getString(1)), width, height))
        }
      }
    spark.createDataFrame(rows, schema)
  }

  val aviFrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("fps", DoubleType),
    StructField("n_frames", LongType),
    StructField("frame_bytes", LongType),
    StructField("frame_mean_lum", DoubleType)))

  /** AVI frame demux in the mm3 batch shape with the REAL demuxer: one row
    * per container frame, stats from the frame's actual channel bytes;
    * malformed containers dropped. The fan-out per payload is its true
    * frame count — bounded and predictable, exactly like mm3's stride
    * arithmetic, but read from a genuine container index walk.
    */
  def aviFrames(binaries: DataFrame): DataFrame = {
    val spark = binaries.sparkSession
    val rows = binaries.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        demuxAvi(r.getAs[Array[Byte]](1)).iterator.flatMap { m =>
          m.frames.iterator.map { f =>
            Row(id, f.frameIdx.toLong, m.width.toLong, m.height.toLong,
              m.fps, m.frames.length.toLong, f.nBytes.toLong, f.meanLum)
          }
        }
      }
    }
    spark.createDataFrame(rows, aviFrameSchema)
  }

  /** Streaming-compatible WAV decode: the SAME [[decodeWavPcm16]] as a
    * typed flatMap over (doc_id, payload) rows — no RDD round trip, so it
    * runs identically under `readStream` (per-row, stateless, no shuffle:
    * the shape a landing-zone decode stage has in a streaming ingest
    * pipeline). Output schema matches [[wavFeatures]] column-for-column;
    * spec-asserted equal on both paths.
    */
  def wavFeaturesStreaming(binaries: DataFrame): DataFrame = {
    val spark = binaries.sparkSession
    import spark.implicits._
    binaries.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        decodeWavPcm16(payload).map(m =>
          (id, m.channels.toLong, m.sampleRate.toLong, m.bitsPerSample.toLong,
            m.nSamples, m.durationSec, m.rms))
      }
      .toDF("doc_id", "channels", "sample_rate", "bits", "n_samples",
        "duration_sec", "rms")
  }

  val pageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("page_idx", LongType),
    StructField("page_offset", LongType),
    StructField("page_len", LongType),
    StructField("page_sum_mod", DoubleType)))

  /** Fixed-stride binary PAGE sampling — a decode-free LAYOUT operator (not
    * a decoder: nothing here interprets a container format; for real frame
    * demux see [[aviFrames]]). Every `strideBytes`-th position yields one
    * row summarizing the `pageBytes`-byte slice there — the cheap
    * probe-every-Nth-page shape used for corruption scans, sniff-sampling
    * and storage audits over opaque blobs. Fan-out is byte_len/strideBytes
    * — bounded and predictable at 100 TB; the per-page checksum keeps the
    * output columnar instead of shipping raw bytes downstream.
    */
  def samplePages(
      binaries: DataFrame,
      pageBytes: Int = 16,
      strideBytes: Int = 64): DataFrame = {
    require(pageBytes > 0 && strideBytes > 0, "need positive page/stride")
    val spark = binaries.sparkSession
    val rows = binaries.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val nPages = if (payload.length == 0) 0 else (payload.length - 1) / strideBytes + 1
        (0 until nPages).iterator.map { k =>
          val off = k * strideBytes
          val end = math.min(payload.length, off + pageBytes)
          var sum = 0L
          var i = off
          while (i < end) { sum += payload(i) & 0xff; i += 1 }
          Row(id, k.toLong, off.toLong, (end - off).toLong, (sum % 256).toDouble)
        }
      }
    }
    spark.createDataFrame(rows, pageSchema)
  }
}
