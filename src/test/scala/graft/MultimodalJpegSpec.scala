package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JpegCodec, PgmCodec}

/** Error-bound pins for the JPEG decode leg (oracle-exempt — DuckDB
  * cannot decode JPEG and the lossy bytes are codec-defined): the
  * codec must round-trip dimensions exactly, reconstruct pixels within
  * a JPEG-plausible error bound, produce real JFIF bytes, be
  * deterministic, and fail loudly on garbage.
  */
class MultimodalJpegSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("flat gray image round-trips near-exactly") {
    // A constant image is the JPEG best case: DC-only blocks, error ≤ 1.
    val flat = PgmCodec.Pgm(16, 16, 255, Array.fill(256)(0x77.toByte))
    val jpeg = JpegCodec.encode(flat)
    // real JFIF container: SOI marker 0xFFD8, EOI 0xFFD9
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8, "missing SOI")
    assert((jpeg(jpeg.length - 2) & 0xff) == 0xff &&
      (jpeg(jpeg.length - 1) & 0xff) == 0xd9, "missing EOI")
    val dec = JpegCodec.decode(jpeg)
    assert(dec.width == 16 && dec.height == 16)
    dec.pixels.foreach(p => assert(math.abs((p & 0xff) - 0x77) <= 1))
  }

  test("gradient image round-trips within JPEG tolerance, deterministically") {
    val px = Array.tabulate(64 * 32)(i => ((i * 3) % 256).toByte)
    val src = PgmCodec.Pgm(64, 32, 255, px)
    val jpegA = JpegCodec.encode(src)
    val jpegB = JpegCodec.encode(src)
    assert(jpegA.toSeq == jpegB.toSeq, "encoder not deterministic")
    val dec = JpegCodec.decode(jpegA)
    assert(dec.width == 64 && dec.height == 32)
    assert(dec.pixels.length == 64 * 32)
    val mae = px.indices.map(i =>
      math.abs((px(i) & 0xff) - (dec.pixels(i) & 0xff))).sum.toDouble / px.length
    assert(mae < 20.0, s"mean abs error $mae implausibly high for default-quality JPEG")
  }

  test("undecodable bytes fail loudly, not as a zero-filled raster") {
    val e = intercept[IllegalArgumentException](
      JpegCodec.decode("this is not a jpeg".getBytes("US-ASCII")))
    assert(e.getMessage.contains("undecodable"))
  }

  test("mm_decode_jpeg: real files, dims survive, errors bounded, sidecar pinned") {
    import org.apache.spark.sql.functions.expr
    // round 11: the row runs off a real .jpg landing over the
    // md5-prefix subset, with the landing-time decode pinned in a
    // sidecar parquet the DuckDB oracle reads
    val subset = Tables.documents(spark, sf)
      .filter(expr("substring(md5(CAST(doc_id AS STRING)), 1, 4) < '2000'"))
      .count()
    val rows = SparkEntry.queries("mm_decode_jpeg")(spark, sf).collect()
    assert(rows.length == subset && subset > 0)
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("width")) == PgmCodec.WrapWidth)
      assert(r.getInt(r.fieldIndex("height")) > 0)
      assert(r.getLong(r.fieldIndex("n_jpeg_bytes")) > 0)
      // text rasters are high-frequency content — JPEG's worst case —
      // so the bound is loose but must still be far from "decoded
      // noise": mean abs err = sum_abs_err / (8·h) < 64
      val nPix = 8L * r.getInt(r.fieldIndex("height"))
      assert(r.getLong(r.fieldIndex("sum_abs_err")) < 64L * nPix,
        s"mean abs error implausibly high for doc ${r.getLong(0)}")
      assert(r.getInt(r.fieldIndex("max_abs_err")) <= 255)
      assert(r.getString(r.fieldIndex("pixels_md5")).length == 32)
    }
    // determinism across runs (what the sidecar contract relies on:
    // a fresh decode of the same files must reproduce the pin)
    val again = SparkEntry.queries("mm_decode_jpeg")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // the dumped oracle references THIS process's sidecar
    assert(SparkEntry.oracleSql("mm_decode_jpeg").contains("read_parquet"))
    assert(!SparkEntry.oracleSql("mm_decode_jpeg").contains("never_landed"),
      "oracle dumped before the query landed its sidecar")
  }
}
