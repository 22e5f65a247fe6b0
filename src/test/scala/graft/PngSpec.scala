package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The PNG codec's contract: round-trip through every filter type,
  * byte-level agreement with the JDK's own ImageIO codec in BOTH
  * directions (our encoder read by ImageIO, ImageIO's adaptive-filter
  * encoder read by us), truecolor support, and loud rejection of
  * malformed payloads.
  */
class PngSpec extends SparkSuite {

  private val pixels: Array[Int] =
    Array.tabulate(32 * 7 - 5)(i => (i * 37 + 11) % 256) // 7 rows: all filters

  test("round trip: the writer's five rotating filters all unfilter exactly") {
    val png = Multimodal.encodePng(pixels, 32)
    val m = Multimodal.decodePng(png).get
    assert(m.width === 32 && m.height === 7)
    assert(m.bitDepth === 8 && m.colorType === 0)
    assert(m.nPixels === 224L)
    val padded = pixels.padTo(224, 0)
    assert(m.meanLum === padded.sum.toDouble / 224)
  }

  test("ImageIO reads our PNGs pixel-exactly; we read ImageIO's") {
    import java.awt.image.BufferedImage
    // ours -> ImageIO
    val png = Multimodal.encodePng(pixels, 32)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 32 && img.getHeight === 7)
    val padded = pixels.padTo(224, 0)
    for (r <- 0 until 7; x <- 0 until 32)
      assert((img.getRaster.getSample(x, r, 0) & 0xff) === padded(r * 32 + x),
        s"pixel ($x,$r)")
    // ImageIO (adaptive filters, its own zlib strategy) -> ours
    val ref = new BufferedImage(32, 7, BufferedImage.TYPE_BYTE_GRAY)
    for (r <- 0 until 7; x <- 0 until 32)
      ref.getRaster.setSample(x, r, 0, padded(r * 32 + x))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(ref, "png", bos))
    val m = Multimodal.decodePng(bos.toByteArray).get
    assert(m.width === 32 && m.height === 7 && m.colorType === 0)
    assert(m.meanLum === padded.sum.toDouble / 224)
  }

  test("truecolor (color type 2) PNGs decode with 3-channel luminance") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(5, 3, BufferedImage.TYPE_INT_RGB)
    var sum = 0L
    for (y <- 0 until 3; x <- 0 until 5) {
      val (r, g, b) = ((x * 50) % 256, (y * 90) % 256, (x * y * 30) % 256)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      sum += r + g + b
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val m = Multimodal.decodePng(bos.toByteArray).get
    assert(m.width === 5 && m.height === 3 && m.colorType === 2)
    assert(m.nPixels === 15L)
    assert(m.meanLum === sum.toDouble / 45)
  }

  test("malformed payloads decode to None, never garbage") {
    val good = Multimodal.encodePng(pixels, 32)
    assert(Multimodal.decodePng("nope".getBytes).isEmpty)
    assert(Multimodal.decodePng(good.take(30)).isEmpty, "truncated")
    val corrupted = good.clone()
    corrupted(40) = (corrupted(40) ^ 0x55).toByte // inside IHDR/IDAT body
    assert(Multimodal.decodePng(corrupted).isEmpty, "CRC mismatch must reject")
    val sigFlip = good.clone()
    sigFlip(0) = 0x42
    assert(Multimodal.decodePng(sigFlip).isEmpty)
  }

  test("overflow-crafted payloads decode to None, never throw") {
    // CRC-valid chunks carrying adversarial arithmetic: a chunk length
    // near Int.MaxValue (len + 8 wraps negative) and huge CRC-valid IHDR
    // dimensions (width * bpp / rowLen * height wrap) — both must take
    // the None path, not crash the task inside pngFeatures
    def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      bb.putInt(body.length)
      val tb = typ.getBytes("US-ASCII")
      bb.put(tb); bb.put(body)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    def ihdr(w: Int, h: Int, colorType: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(13)
      b.putInt(w).putInt(h)
      b.put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      chunk("IHDR", b.array())
    }
    // 1. chunk length Int.MaxValue - 4: old `remaining < len + 8` wrapped
    val hugeLen = {
      val bb = java.nio.ByteBuffer.allocate(8 + 12)
      bb.put(sig)
      bb.putInt(Int.MaxValue - 4)
      bb.put("IHDR".getBytes("US-ASCII"))
      bb.putInt(0)
      bb.array()
    }
    assert(Multimodal.decodePng(hugeLen).isEmpty)
    // 2. truecolor with width so large width * 3 wraps negative
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(Array[Byte](0)); d.finish()
      val out = new Array[Byte](64); val n = d.deflate(out); d.end()
      out.take(n)
    }
    val hugeW = sig ++ ihdr(0x60000000, 1, 2) ++
      chunk("IDAT", deflated) ++ chunk("IEND", Array.empty)
    assert(Multimodal.decodePng(hugeW).isEmpty)
    // 3. rowLen * height wraps: both dims large, individually valid
    val hugeWH = sig ++ ihdr(0x10000, 0x10000, 0) ++
      chunk("IDAT", deflated) ++ chunk("IEND", Array.empty)
    assert(Multimodal.decodePng(hugeWH).isEmpty)
    // 4. BOTH dims at Int.MaxValue, truecolor: rowLen * height overflows
    // even LONG (3·(2^31-1)² ≈ 1.4e19 > 2^63), wrapping negative past a
    // plain `> Int.MaxValue` check — the division-bounded guard rejects
    val hugeLong = sig ++ ihdr(Int.MaxValue, Int.MaxValue, 2) ++
      chunk("IDAT", deflated) ++ chunk("IEND", Array.empty)
    assert(Multimodal.decodePng(hugeLong).isEmpty)
    // 5. dimensions that pass the Int bound but declare ~2 GB from a
    // 10-byte IDAT: the zlib inflation bound (~1032:1) rejects BEFORE
    // the allocation — no OOM path from a 100-byte payload
    val oomBait = sig ++ ihdr(46000, 46000, 0) ++
      chunk("IDAT", deflated) ++ chunk("IEND", Array.empty)
    assert(Multimodal.decodePng(oomBait).isEmpty)
  }

  test("corruption fuzz: 300 random mutations never crash, only reject or decode") {
    val rnd = new scala.util.Random(0xC0FFEE)
    val good = Multimodal.encodePng(pixels, 32)
    var rejected = 0
    for (_ <- 0 until 300) {
      val mutated = good.clone()
      val flips = rnd.nextInt(4) + 1
      for (_ <- 0 until flips)
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      // must never throw; CRC verification catches essentially all of
      // these (a mutation that leaves every CRC valid decodes fine)
      Multimodal.decodePng(mutated) match {
        case None => rejected += 1
        case Some(m) => assert(m.width === 32 && m.height === 7)
      }
      // random truncation as well
      val cut = rnd.nextInt(good.length)
      assert(Multimodal.decodePng(good.take(cut)).isEmpty || cut == good.length)
    }
    assert(rejected > 250, s"CRCs should reject nearly all mutations, got $rejected")
  }

  test("pngFeatures over the documents table matches the BMP luminance law") {
    // same textToPixels stream, same zero-padded fixed-width layout —
    // the grayscale PNG mean must equal the BMP channel mean per doc
    val docs = Tables(spark, sfDir, "documents").limit(50)
    val png = Multimodal.pngFeatures(Multimodal.asPng(docs))
      .select(col("doc_id"), col("mean_lum"), col("height"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val bmp = Multimodal.bmpFeatures(Multimodal.asBmp(docs))
      .select(col("doc_id"), col("mean_lum"), col("height"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(png.nonEmpty && png.keySet === bmp.keySet)
    png.foreach { case (id, (lum, h)) =>
      assert(bmp(id)._2 === h, s"doc $id height")
      assert(math.abs(bmp(id)._1 - lum) < 1e-12, s"doc $id lum")
    }
  }
}
