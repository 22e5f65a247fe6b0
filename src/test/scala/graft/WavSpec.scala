package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The mm4 decoder must be format-real, not a mirror of the repo's own
  * writer: these payloads are hand-assembled byte-by-byte (different chunk
  * order, extra unknown chunks, odd sizes, stereo) and malformed variants
  * must be rejected, not mis-read.
  */
class WavSpec extends AnyFunSuite {

  private def le(capacity: Int): ByteBuffer =
    ByteBuffer.allocate(capacity).order(ByteOrder.LITTLE_ENDIAN)

  private def ascii(b: ByteBuffer, s: String): ByteBuffer =
    b.put(s.getBytes("US-ASCII"))

  /** Hand-built WAV: LIST chunk first, then an odd-sized junk chunk (word
    * padding required), then fmt, then data — a chunk layout the repo's
    * canonical writer never emits.
    */
  private def exoticWav(samples: Seq[Short], rate: Int, channels: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val body = 4 + (8 + 4) + (8 + 3 + 1) + (8 + 16) + (8 + dataLen)
    val b = le(8 + body)
    ascii(b, "RIFF").putInt(body)
    ascii(b, "WAVE")
    ascii(b, "LIST").putInt(4)
    ascii(b, "INFO")
    ascii(b, "junk").putInt(3).put(Array[Byte](1, 2, 3)).put(0.toByte) // pad
    ascii(b, "fmt ").putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * 2 * channels).putShort((2 * channels).toShort).putShort(16)
    ascii(b, "data").putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  test("decodes a hand-assembled mono WAV with unknown + odd-sized chunks") {
    val samples = Seq[Short](1000, -1000, 32767, -32768)
    val m = Multimodal.decodeWavPcm16(exoticWav(samples, 44100, 1)).get
    assert(m.channels === 1)
    assert(m.sampleRate === 44100)
    assert(m.bitsPerSample === 16)
    assert(m.nSamples === 4L)
    assert(m.durationSec === 4.0 / 44100)
    val ss = samples.map(s => s.toLong * s).sum
    assert(m.rms === math.sqrt(ss.toDouble / 4))
  }

  test("stereo: duration counts frames per channel, RMS all interleaved samples") {
    val samples = Seq[Short](100, -100, 200, -200) // 2 frames x 2 channels
    val m = Multimodal.decodeWavPcm16(exoticWav(samples, 8000, 2)).get
    assert(m.channels === 2)
    assert(m.nSamples === 4L)
    assert(m.durationSec === 2.0 / 8000)
  }

  test("writer output round-trips through the decoder") {
    val text = "Hello wav world"
    val samples = Multimodal.textToSamples(text)
    val m = Multimodal.decodeWavPcm16(Multimodal.encodeWavPcm16(samples, 8000)).get
    assert(m.channels === 1)
    assert(m.sampleRate === 8000)
    assert(m.nSamples === text.length.toLong)
    assert(m.durationSec === text.length.toDouble / 8000)
    val ss = samples.map(s => s.toLong * s).sum
    assert(m.rms === math.sqrt(ss.toDouble / samples.length))
  }

  test("zero-sample payload decodes with rms 0, not NaN") {
    val m = Multimodal.decodeWavPcm16(
      Multimodal.encodeWavPcm16(Array.empty[Short], 8000)).get
    assert(m.nSamples === 0L)
    assert(m.durationSec === 0.0)
    assert(m.rms === 0.0)
  }

  test("malformed payloads are rejected, never mis-decoded") {
    val good = exoticWav(Seq[Short](1, 2), 8000, 1)
    assert(Multimodal.decodeWavPcm16(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeWavPcm16(good.take(10)).isEmpty) // truncated header
    val badMagic = good.clone(); badMagic(3) = 'X'.toByte
    assert(Multimodal.decodeWavPcm16(badMagic).isEmpty)
    val notWave = good.clone(); notWave(8) = 'A'.toByte
    assert(Multimodal.decodeWavPcm16(notWave).isEmpty)
    // declared data size larger than the remaining bytes → truncated chunk
    val overrun = good.clone()
    val dataSizeOff = good.length - 2 * 2 - 4
    le(4).putInt(9999).array().copyToArray(overrun, dataSizeOff)
    assert(Multimodal.decodeWavPcm16(overrun).isEmpty)
    // IEEE-float format code (3) is not PCM-16
    val float32 = good.clone()
    // fmt body starts right after "fmt "+size; find it: RIFF(12)+LIST(12)+junk(12)+"fmt "(4)+size(4)
    val fmtBody = 12 + 12 + 12 + 8
    float32(fmtBody) = 3
    assert(Multimodal.decodeWavPcm16(float32).isEmpty)
    // 8-bit samples are not this decoder's contract
    val bits8 = good.clone()
    bits8(fmtBody + 14) = 8
    assert(Multimodal.decodeWavPcm16(bits8).isEmpty)
  }
}
