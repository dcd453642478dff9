package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mp4Codec

/** The MP4 parser is a real ISO BMFF box walker: recursive container
  * descent, both size encodings (32-bit, 64-bit largesize, size-0 =
  * to-end-of-scope), unknown-box skipping, and loud failure on every
  * malformation class.
  */
class Mp4CodecSpec extends AnyFunSuite {

  private def be32(v: Long) =
    Array[Byte](((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xffffffffL)
  private def box(t: String, body: Array[Byte]) =
    be32(body.length + 8L) ++ t.getBytes("US-ASCII") ++ body
  private def mvhd(timescale: Long, duration: Long) =
    box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(duration) ++ new Array[Byte](76))

  test("encode → decode round-trips the media data and box census") {
    val payload = "lights, camera, boxes".getBytes("US-ASCII")
    val m = Mp4Codec.decode(Mp4Codec.encode(payload))
    assert(m.mediaData.sameElements(payload))
    assert(m.timescale == 8000L && m.duration == payload.length)
    assert(m.boxes.map(_.boxType) == Seq("ftyp", "moov", "mvhd", "free", "mdat"))
    assert(m.boxes.count(_.depth == 0) == 4)
    assert(m.boxes.find(_.boxType == "mvhd").get.depth == 1)
  }

  test("64-bit largesize and size-0 (to end of scope) both parse") {
    val payload = Array[Byte](1, 2, 3, 4, 5)
    // mdat with largesize encoding: size=1, fourcc, 64-bit size, body.
    val largeMdat = be32(1) ++ "mdat".getBytes("US-ASCII") ++
      be64(16L + payload.length) ++ payload
    val m = Mp4Codec.decode(box("moov", mvhd(1000, 5)) ++ largeMdat)
    assert(m.mediaData.sameElements(payload))
    // size-0 mdat extends to end of file.
    val zeroMdat = be32(0) ++ "mdat".getBytes("US-ASCII") ++ payload
    val m2 = Mp4Codec.decode(box("moov", mvhd(1000, 5)) ++ zeroMdat)
    assert(m2.mediaData.sameElements(payload))
  }

  test("nested containers walk recursively") {
    val inner = box("trak", box("mdia", box("free", Array[Byte](9))))
    val bytes = box("moov", mvhd(1000, 1) ++ inner) ++
      box("mdat", Array[Byte](7))
    val m = Mp4Codec.decode(bytes)
    assert(m.boxes.map(b => (b.boxType, b.depth)) ==
      Seq(("moov", 0), ("mvhd", 1), ("trak", 1), ("mdia", 2), ("free", 3),
        ("mdat", 0)))
  }

  test("malformed inputs fail loudly with specific messages") {
    def expectFail(bytes: Array[Byte], fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](Mp4Codec.decode(bytes))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    // box size smaller than its own header
    expectFail(be32(4) ++ "mdat".getBytes("US-ASCII"), "under its 8-byte header")
    // box runs past end of file
    expectFail(be32(100) ++ "mdat".getBytes("US-ASCII") ++ Array[Byte](1),
      "past its parent's end")
    // child overruns its container
    expectFail(box("moov", be32(100) ++ "mvhd".getBytes("US-ASCII")),
      "past its parent's end")
    // trailing garbage with no room for a header
    expectFail(box("mdat", Array[Byte](1)) ++ Array[Byte](0, 0, 0),
      "no room for a box header")
    // truncated largesize
    expectFail(be32(1) ++ "mdat".getBytes("US-ASCII") ++ be32(0),
      "largesize truncated")
    // structurally fine but missing mdat / mvhd
    expectFail(box("moov", mvhd(1000, 0)), "no mdat")
    expectFail(box("mdat", Array[Byte](1)), "no mvhd")
    expectFail(box("moov", mvhd(0, 0)) ++ box("mdat", Array.emptyByteArray),
      "non-positive timescale")
  }

  test("frame sampling strides the media data") {
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val m = Mp4Codec.decode(Mp4Codec.encode(payload))
    val frames = Mp4Codec.sampleFrames(m, 32)
    assert(frames.sameElements(Array[Byte](0, 32, 64, 96)))
  }
}
