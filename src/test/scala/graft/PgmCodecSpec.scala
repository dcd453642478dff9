package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PgmCodec
import graft.functions.PgmCodec.Pgm

/** The PGM parser is a real codec: spec-conformant inputs (including
  * comment lines and exotic header whitespace) must decode, and every
  * malformation class must fail loudly — a media decoder that
  * zero-fills corrupt input poisons all downstream features.
  */
class PgmCodecSpec extends AnyFunSuite {

  test("encode → decode round-trips payload bytes with space padding") {
    val payload = "hello world, twenty-six!!".getBytes("US-ASCII") // 25 bytes
    val img = PgmCodec.decode(PgmCodec.encode(payload))
    assert(img.width == 8 && img.height == 4 && img.maxVal == 255)
    assert(img.pixels.length == 32)
    assert(img.pixels.take(25).sameElements(payload))
    assert(img.pixels.drop(25).forall(_ == ' '.toByte))
  }

  test("empty payload wraps to one padded row") {
    val img = PgmCodec.decode(PgmCodec.encode(Array.emptyByteArray))
    assert(img.width == 8 && img.height == 1)
    assert(img.pixels.forall(_ == ' '.toByte))
  }

  test("parses Netpbm comments and arbitrary header whitespace") {
    val raster = Array.tabulate(6)(i => (i * 10).toByte)
    val bytes = ("P5 # magic then comment\n# full comment line\n 3\t2 # dims\n255\n")
      .getBytes("US-ASCII") ++ raster
    val img = PgmCodec.decode(bytes)
    assert(img.width == 3 && img.height == 2 && img.maxVal == 255)
    assert(img.pixels.sameElements(raster))
  }

  test("malformed inputs fail loudly with specific messages") {
    def expectFail(bytes: Array[Byte], fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](PgmCodec.decode(bytes))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    expectFail("P6\n1 1\n255\n ".getBytes("US-ASCII"), "P5 magic")
    expectFail("P5\n1 ".getBytes("US-ASCII"), "height")
    expectFail("P5\n0 1\n255\n ".getBytes("US-ASCII"), "non-positive")
    expectFail("P5\n1 1\n70000\n ".getBytes("US-ASCII"), "maxval")
    expectFail("P5\n2 2\n255\nab".getBytes("US-ASCII"), "truncated")
    // 65536 × 65536 wraps to 0 in Int arithmetic — must refuse, not
    // silently return an empty raster disagreeing with the header
    expectFail("P5\n65536 65536\n255\n ".getBytes("US-ASCII"), "overflows")
    expectFail("P5\n40000 50000\n255\n ".getBytes("US-ASCII"), "truncated")
  }

  test("nearest-neighbor resize samples the decoded raster, not bytes") {
    // 2×4 image (w=2, h=4), rows [0 1], [10 11], [20 21], [30 31].
    val img = Pgm(2, 4, 255,
      Array[Byte](0, 1, 10, 11, 20, 21, 30, 31))
    val down = PgmCodec.resize(img, 2, 2) // rows 0 and 2 survive
    assert(down.pixels.sameElements(Array[Byte](0, 1, 20, 21)))
    val up = PgmCodec.resize(img, 4, 4) // each source col duplicated
    assert(up.pixels.sameElements(Array[Byte](
      0, 0, 1, 1, 10, 10, 11, 11, 20, 20, 21, 21, 30, 30, 31, 31)))
  }

  test("gray histogram is L1-normalized over bins mod 16") {
    val h = PgmCodec.grayHistogram(Array[Byte](0, 16, 32, 15), 16)
    assert(h(0) == 0.75f && h(15) == 0.25f)
    assert(math.abs(h.sum - 1f) < 1e-6)
  }
}
