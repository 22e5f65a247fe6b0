package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The mm5 decoder must be format-real: hand-assembled bitmaps exercise
  * top-down orientation, a non-contiguous declared pixel offset, row
  * padding, and distinct B/G/R channels — none of which the repo's own
  * writer produces — and malformed variants must be rejected.
  */
class BmpSpec extends AnyFunSuite {

  /** Hand-built 3x2 24bpp BMP: TOP-DOWN (negative height), pixel data at a
    * declared offset beyond the headers (4-byte gap), stride 12 (3 pad
    * bytes per row), channels all different.
    */
  private def exoticBmp(): (Array[Byte], Long, Double) = {
    val width = 3
    val height = 2
    val stride = 12
    val gap = 4
    val b = ByteBuffer.allocate(54 + gap + stride * height)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(b.capacity()).putInt(0).putInt(54 + gap)
    b.putInt(40).putInt(width).putInt(-height) // top-down
    b.putShort(1).putShort(24).putInt(0).putInt(stride * height)
    b.putInt(2835).putInt(2835).putInt(0).putInt(0)
    b.putInt(0xdeadbeef) // the gap: garbage the decoder must skip via offset
    // row 0: pixels (10,20,30) (40,50,60) (70,80,90) + 3 pad bytes
    b.put(Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, -1, -1, -1))
    // row 1: pixels (5,5,5) (0,0,0) (255,0,1) + pad
    b.put(Array[Byte](5, 5, 5, 0, 0, 0, -1, 0, 1, 7, 7, 7))
    val channelSum = (10 + 20 + 30 + 40 + 50 + 60 + 70 + 80 + 90) +
      (5 + 5 + 5) + 0 + (255 + 0 + 1)
    (b.array(), 6L, channelSum.toDouble / (3.0 * 6))
  }

  test("decodes a hand-assembled top-down BMP with offset gap and row padding") {
    val (bytes, nPixels, meanLum) = exoticBmp()
    val m = Multimodal.decodeBmp(bytes).get
    assert(m.width === 3)
    assert(m.height === 2)
    assert(m.bpp === 24)
    assert(m.nPixels === nPixels)
    assert(m.meanLum === meanLum)
  }

  test("writer output round-trips through the decoder") {
    val text = "Hello bitmap world, wider than one row when width is four"
    val px = Multimodal.textToPixels(text)
    val m = Multimodal.decodeBmp(Multimodal.encodeBmp24(px, width = 4)).get
    assert(m.width === 4)
    assert(m.height === (px.length + 3) / 4)
    val padded = m.nPixels - px.length
    assert(padded >= 0 && padded < 4)
    // channels are equal in written bitmaps: mean over 3n channels = pixel mean
    assert(m.meanLum === (3L * px.sum).toDouble / (3.0 * m.nPixels))
  }

  test("empty document still produces one valid blank row") {
    val m = Multimodal.decodeBmp(Multimodal.encodeBmp24(Array.empty[Int], 32)).get
    assert(m.height === 1)
    assert(m.nPixels === 32L)
    assert(m.meanLum === 0.0)
  }

  test("malformed bitmaps are rejected, never mis-decoded") {
    val (good, _, _) = exoticBmp()
    assert(Multimodal.decodeBmp(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeBmp(good.take(40)).isEmpty) // truncated header
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Multimodal.decodeBmp(badMagic).isEmpty)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8 compression
    assert(Multimodal.decodeBmp(rle).isEmpty)
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(Multimodal.decodeBmp(bpp8).isEmpty)
    // pixel array overruns the buffer: claim a huge positive height
    val tall = good.clone()
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(999)
      .array().copyToArray(tall, 22)
    assert(Multimodal.decodeBmp(tall).isEmpty)
    val zeroWidth = good.clone()
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(0)
      .array().copyToArray(zeroWidth, 18)
    assert(Multimodal.decodeBmp(zeroWidth).isEmpty)
  }
}
