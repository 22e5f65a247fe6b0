package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The mm6 demuxer must be container-real: hand-assembled AVIs exercise
  * JUNK/idx1 chunks, '00dc' frame ids, and odd-sized chunk padding — none
  * of which the repo's writer emits — and malformed containers must be
  * rejected.
  */
class AviSpec extends AnyFunSuite {

  private def le(capacity: Int): ByteBuffer =
    ByteBuffer.allocate(capacity).order(ByteOrder.LITTLE_ENDIAN)

  private def cc(b: ByteBuffer, s: String): ByteBuffer =
    b.put(s.getBytes("US-ASCII"))

  /** Hand-built 2x1 24bpp AVI, 2 frames, with a JUNK chunk in hdrl, a
    * '00dc' second frame, and a trailing idx1 chunk.
    */
  private def exoticAvi(): Array[Byte] = {
    val width = 2
    val height = 1
    val stride = 8 // (2*3+3)&~3
    val avihSize = 56
    val strfSize = 40
    val junkSize = 5 // odd: demuxer must pad to 6
    val hdrlSize = 4 + (8 + avihSize) + (8 + junkSize + 1) + (8 + strfSize)
    val frameBytes = stride * height
    val moviSize = 4 + 2 * (8 + frameBytes)
    val idxSize = 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idxSize)
    val b = le(8 + riffSize)
    cc(b, "RIFF").putInt(riffSize)
    cc(b, "AVI ")
    cc(b, "LIST").putInt(hdrlSize)
    cc(b, "hdrl")
    cc(b, "avih").putInt(avihSize)
    b.putInt(100000) // 10 fps
    b.putInt(0).putInt(0).putInt(0)
    b.putInt(2) // declared frames
    b.putInt(0).putInt(1).putInt(frameBytes)
    b.putInt(width).putInt(height)
    b.putInt(0).putInt(0).putInt(0).putInt(0)
    cc(b, "JUNK").putInt(junkSize).put(Array[Byte](9, 9, 9, 9, 9)).put(0.toByte)
    cc(b, "strf").putInt(strfSize)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    b.putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    cc(b, "LIST").putInt(moviSize)
    cc(b, "movi")
    // frame 0 ('00db'): pixels (10,20,30) (40,50,60) + 2 stride pad bytes
    cc(b, "00db").putInt(frameBytes)
    b.put(Array[Byte](10, 20, 30, 40, 50, 60, -1, -1))
    // frame 1 ('00dc'): pixels (1,2,3) (4,5,6)
    cc(b, "00dc").putInt(frameBytes)
    b.put(Array[Byte](1, 2, 3, 4, 5, 6, 0, 0))
    cc(b, "idx1").putInt(idxSize)
    b.put(new Array[Byte](idxSize))
    b.array()
  }

  test("demuxes a hand-assembled AVI with JUNK/idx1/00dc chunks") {
    val m = Multimodal.demuxAvi(exoticAvi()).get
    assert(m.width === 2)
    assert(m.height === 1)
    assert(m.fps === 10.0)
    assert(m.declaredFrames === 2)
    assert(m.frames.length === 2)
    // stride-aware mean: the 2 pad bytes per row must NOT count
    assert(m.frames(0).meanLum === (10 + 20 + 30 + 40 + 50 + 60).toDouble / 6)
    assert(m.frames(1).meanLum === (1 + 2 + 3 + 4 + 5 + 6).toDouble / 6)
    assert(m.frames(0).nBytes === 8)
  }

  test("writer output round-trips through the demuxer") {
    val text = "a" * 130 // 3 frames at 64 px/frame
    val px = Multimodal.textToPixels(text)
    val m = Multimodal.demuxAvi(Multimodal.encodeAvi(px)).get
    assert(m.width === 8 && m.height === 8)
    assert(m.fps === 25.0)
    assert(m.declaredFrames === 3)
    assert(m.frames.length === 3)
    val lum = 'a'.toInt % 256
    assert(m.frames(0).meanLum === lum.toDouble) // full frame of 'a'
    // final frame: 2 real pixels + 62 zero-padded
    assert(m.frames(2).meanLum === (3L * 2 * lum).toDouble / 192)
  }

  test("empty document yields one blank frame") {
    val m = Multimodal.demuxAvi(Multimodal.encodeAvi(Array.empty[Int])).get
    assert(m.frames.length === 1)
    assert(m.frames(0).meanLum === 0.0)
  }

  test("malformed containers are rejected") {
    val good = exoticAvi()
    assert(Multimodal.demuxAvi(Array.empty[Byte]).isEmpty)
    assert(Multimodal.demuxAvi(good.take(11)).isEmpty)
    val badForm = good.clone(); badForm(8) = 'W'.toByte // not 'AVI '
    assert(Multimodal.demuxAvi(badForm).isEmpty)
    // chunk size overruns the container
    val overrun = good.clone()
    le(4).putInt(1 << 30).array().copyToArray(overrun, 16) // hdrl LIST size
    assert(Multimodal.demuxAvi(overrun).isEmpty)
    // compressed stream (non-zero biCompression in strf)
    val compressed = good.clone()
    val strfBody = 12 + 8 + 4 + (8 + 56) + (8 + 6) + 8
    le(4).putInt(1).array().copyToArray(compressed, strfBody + 16)
    assert(Multimodal.demuxAvi(compressed).isEmpty)
  }
}
