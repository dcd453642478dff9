package graft.functions

import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

/** PNG leg of the multimodal decode seam, on the in-JDK
  * `javax.imageio` codec (no new dependency) — completing the
  * production image triple (PGM, JPEG, PNG) through the identical
  * `mapPartitions` batch path. PNG is LOSSLESS: a grayscale raster
  * round-trips byte-exactly, so unlike the JPEG leg the query over it
  * (`mm_decode_png`) is pinned by the SQL ORACLE — the checksum of the
  * post-decode raster must equal the arithmetically reconstructed
  * raster's, like `mm_decode_pgm` — with round-trip and
  * garbage-rejection ScalaTests on top.
  */
object PngCodec {

  /** Encode a grayscale raster as a real PNG (TYPE_BYTE_GRAY → 8-bit
    * grayscale PNG via the JDK writer).
    */
  def encode(p: PgmCodec.Pgm): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      p.width, p.height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, p.width, p.height, p.pixels)
    val bos = new ByteArrayOutputStream()
    val ok = ImageIO.write(img, "png", bos)
    if (!ok) throw new IllegalStateException("no PNG writer available")
    bos.toByteArray
  }

  /** Decode PNG bytes to a grayscale raster. Fails loudly on
    * undecodable input — same contract as [[PgmCodec.decode]] /
    * [[JpegCodec.decode]].
    */
  def decode(bytes: Array[Byte]): PgmCodec.Pgm = JpegCodec.decodeGray(bytes, "PNG")
}
