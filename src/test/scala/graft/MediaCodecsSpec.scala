package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MediaCodecs

/** Pure-JVM media codecs: roundtrips plus the format corners a naive
  * fixed-offset reader gets wrong (PPM header comments, RIFF chunk
  * walking, truncation). */
class MediaCodecsSpec extends AnyFunSuite {

  test("ppm: encode/decode roundtrip") {
    val px = Array.tabulate(3 * 4 * 3)(i => (i * 11 % 256).toByte)
    val img = MediaCodecs.decodePpm(MediaCodecs.encodePpm(4, 3, px))
    assert(img.width == 4 && img.height == 3 && img.maxval == 255)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("ppm: header comments and mixed whitespace parse per netpbm spec") {
    val px = Array.tabulate(3 * 2 * 2)(i => i.toByte)
    val header = "P6 # a comment\n# another\n 2\t2 #dims\n255\n"
      .getBytes("US-ASCII")
    val bytes = header ++ px
    val img = MediaCodecs.decodePpm(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("ppm: truncated raster and bad magic throw") {
    val good = MediaCodecs.encodePpm(2, 2, new Array[Byte](12))
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePpm(good.dropRight(1))
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePpm("P5 2 2 255 ".getBytes ++ new Array[Byte](4))
    }
  }

  test("wav: encode/decode roundtrip (mono and stereo)") {
    val mono = Array.tabulate(100)(i => (i * 37 - 1500).toShort)
    val w1 = MediaCodecs.decodeWav(MediaCodecs.encodeWav(16000, 1, mono))
    assert(w1.sampleRate == 16000 && w1.channels == 1)
    assert(w1.samples.toSeq == mono.toSeq)
    val stereo = Array.tabulate(64)(i => (i - 32).toShort)
    val w2 = MediaCodecs.decodeWav(MediaCodecs.encodeWav(44100, 2, stereo))
    assert(w2.channels == 2 && w2.samples.toSeq == stereo.toSeq)
  }

  test("wav: chunk walk skips LIST/fact chunks between fmt and data") {
    val samples = Array.tabulate(10)(i => i.toShort)
    val canonical = MediaCodecs.encodeWav(8000, 1, samples)
    // splice a LIST chunk (odd payload length: exercises word alignment)
    // between "fmt " (ends at offset 36) and "data"
    val listPayload = "INFOxyz".getBytes("US-ASCII") // 7 bytes, odd
    val list = java.nio.ByteBuffer.allocate(8 + listPayload.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    list.put("LIST".getBytes("US-ASCII")).putInt(listPayload.length)
      .put(listPayload).put(0.toByte)
    val spliced = canonical.take(36) ++ list.array() ++ canonical.drop(36)
    // fix the RIFF size field
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val w = MediaCodecs.decodeWav(spliced)
    assert(w.sampleRate == 8000 && w.samples.toSeq == samples.toSeq)
  }

  test("wav: non-PCM and truncated files throw") {
    val good = MediaCodecs.encodeWav(8000, 1, Array.tabulate(4)(_.toShort))
    // flip the audio-format field (offset 20) to 3 (IEEE float)
    val nonPcm = good.clone()
    nonPcm(20) = 3
    intercept[IllegalArgumentException] { MediaCodecs.decodeWav(nonPcm) }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav("RIFF".getBytes ++ new Array[Byte](4))
    }
  }

  test("synth fixtures decode to the oracle formulas") {
    (0L to 40L).foreach { id =>
      val img = MediaCodecs.decodePpm(graft.ops.Multimodal.synthPpm(id))
      assert(img.width == (4 + id % 5) && img.height == (3 + id % 4))
      val j = 5 // spot-check a raster byte against the formula
      assert((img.pixels(j) & 0xff) == ((id * 31 + j * 7) % 256))
      val wav = MediaCodecs.decodeWav(graft.ops.Multimodal.synthWav(id))
      assert(wav.sampleRate == 8000 + (id % 3) * 4000)
      assert(wav.samples.length == 50 + id % 32)
      assert(wav.samples(3) == ((id * 131 + 3 * 17) % 4001 - 2000).toShort)
    }
  }
}
