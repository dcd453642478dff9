package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WavCodec
import graft.functions.WavCodec.Wav

/** The WAV parser is a real RIFF codec: chunk-walking (unknown chunks
  * skipped, odd sizes padded), format-block consistency validation,
  * and loud failure on every malformation class — plus exactness of
  * the integer feature math the oracle re-derives.
  */
class WavCodecSpec extends AnyFunSuite {

  private def le16(v: Int) =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def chunk(id: String, body: Array[Byte]) =
    id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
      (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
  private def riff(chunks: Array[Byte]) =
    "RIFF".getBytes("US-ASCII") ++ le32(chunks.length + 4) ++
      "WAVE".getBytes("US-ASCII") ++ chunks
  private val fmtPcm16Mono8k =
    le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)

  test("encode → decode round-trips the widened samples") {
    val payload = "Hello, WAV!".getBytes("US-ASCII")
    val w = WavCodec.decode(WavCodec.encode(payload))
    assert(w.sampleRate == 8000 && w.channels == 1 && w.bitsPerSample == 16)
    assert(w.samples.length == payload.length)
    payload.zip(w.samples).foreach { case (b, s) =>
      assert(s == (((b & 0xff) - 128) << 8))
    }
  }

  test("empty payload decodes to an empty stream") {
    val w = WavCodec.decode(WavCodec.encode(Array.emptyByteArray))
    assert(w.samples.isEmpty && w.sampleRate == 8000)
  }

  test("unknown chunks are skipped, including odd-sized with pad byte") {
    // data preceded by an odd-sized junk chunk: the parser must land on
    // the even-padded boundary or it misreads everything after.
    val data = chunk("data", le16(0x0102) ++ le16(0xfffe))
    val bytes = riff(chunk("fmt ", fmtPcm16Mono8k) ++
      chunk("junk", Array[Byte](1, 2, 3)) ++ data)
    val w = WavCodec.decode(bytes)
    assert(w.samples.sameElements(Array[Short](0x0102, -2)))
  }

  test("malformed inputs fail loudly with specific messages") {
    def expectFail(bytes: Array[Byte], fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](WavCodec.decode(bytes))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    expectFail("RIFX1234WAVE".getBytes("US-ASCII"), "RIFF magic")
    expectFail("RIFF".getBytes("US-ASCII") ++ le32(4) ++ "AVI ".getBytes("US-ASCII"),
      "not WAVE")
    expectFail(riff(chunk("fmt ", fmtPcm16Mono8k)), "no data chunk")
    expectFail(riff(chunk("data", le16(0))), "data chunk before fmt")
    // non-PCM format tag
    expectFail(riff(chunk("fmt ",
      le16(3) ++ fmtPcm16Mono8k.drop(2)) ++ chunk("data", le16(0))), "not PCM")
    // blockAlign contradicting channels × bits
    expectFail(riff(chunk("fmt ",
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(4) ++ le16(16)) ++
      chunk("data", le16(0))), "blockAlign")
    // byteRate contradicting rate × blockAlign
    expectFail(riff(chunk("fmt ",
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(999) ++ le16(2) ++ le16(16)) ++
      chunk("data", le16(0))), "byteRate")
    // odd data size cannot hold 16-bit samples
    expectFail(riff(chunk("fmt ", fmtPcm16Mono8k) ++ chunk("data", Array[Byte](7))),
      "odd data size")
    // declared chunk size runs past the RIFF end
    expectFail(riff("data".getBytes("US-ASCII") ++ le32(100)), "truncated")
  }

  test("stats are exact integer arithmetic over the samples") {
    // bytes 128±d ⇒ samples d·256; silence |s| < 16384 ⇔ |d| < 64.
    val payload = Array[Byte](128.toByte, 192.toByte, 64, 136.toByte)
    // samples: 0, 16384, -16384, 2048
    val st = WavCodec.stats(WavCodec.decode(WavCodec.encode(payload)),
      silenceThreshold = 16384, onsetThreshold = 4096)
    assert(st.nSamples == 4)
    assert(st.peakAbs == 16384)
    assert(st.energy == 0L + 16384L * 16384 * 2 + 2048L * 2048)
    assert(st.nSilent == 2) // 0 and 2048
    assert(st.nOnsets == 3) // jumps 16384, 32768, 18432 all ≥ 4096
  }

  test("frame energies cover the tail frame with its true length") {
    val samples = Array.tabulate[Short](5)(i => (i * 256).toShort)
    val fe = WavCodec.frameEnergies(Wav(8000, 1, 16, samples), frameLen = 2)
    assert(fe.length == 3)
    assert(fe(0) == ((2, 0L + 256L * 256)))
    assert(fe(1) == ((2, 512L * 512 + 768L * 768)))
    assert(fe(2) == ((1, 1024L * 1024))) // short tail: covered = 1
  }
}
