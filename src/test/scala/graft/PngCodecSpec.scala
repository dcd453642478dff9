package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PgmCodec, PngCodec}

/** PNG decode leg — unlike JPEG this one is LOSSLESS, so the pins are
  * byte-exact: raster round trip, real PNG container bytes,
  * determinism, loud failure on garbage, and query agreement with the
  * PGM leg's checksum (the same identity the SQL oracle checks).
  */
class PngCodecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("raster round-trips byte-exactly through PNG") {
    val px = Array.tabulate(64 * 32)(i => ((i * 7) % 256).toByte)
    val src = PgmCodec.Pgm(64, 32, 255, px)
    val png = PngCodec.encode(src)
    // real PNG container: 8-byte signature \x89PNG\r\n\x1a\n
    val sig = Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    assert(png.take(8).map(_ & 0xff).toSeq == sig, "missing PNG signature")
    val dec = PngCodec.decode(png)
    assert(dec.width == 64 && dec.height == 32)
    assert(dec.pixels.toSeq == px.toSeq, "PNG round trip not lossless")
    // encoder determinism (the oracle hash-compares reruns)
    assert(PngCodec.encode(src).toSeq == png.toSeq)
  }

  test("undecodable bytes fail loudly, not as a zero-filled raster") {
    val e = intercept[IllegalArgumentException](
      PngCodec.decode("this is not a png".getBytes("US-ASCII")))
    assert(e.getMessage.contains("undecodable"))
    assert(e.getMessage.contains("PNG"))
  }

  test("mm_decode_png equals mm_decode_pgm's raster checksums (lossless seam)") {
    val png = SparkEntry.queries("mm_decode_png")(spark, sf).collect()
    assert(png.length == Tables.documents(spark, sf).count())
    val pgm = SparkEntry.queries("mm_decode_pgm")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("pixels_checksum"))).toMap
    png.foreach { r =>
      assert(r.getString(r.fieldIndex("pixels_checksum")) == pgm(r.getLong(0)),
        s"PNG-decoded raster diverged from source for doc ${r.getLong(0)}")
    }
  }
}
