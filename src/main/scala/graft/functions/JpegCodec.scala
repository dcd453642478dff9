package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** JPEG leg of the multimodal decode seam, on the in-JDK
  * `javax.imageio` codec (no new dependency): grayscale rasters encode
  * to real JFIF/JPEG bytes and decode back through the same
  * `mapPartitions` batch path as [[PgmCodec]]. JPEG is LOSSY — the
  * round trip preserves dimensions exactly and pixel values only
  * approximately — so the query over it is pinned by error-bound
  * ScalaTests (like the sketches) instead of a byte-exact SQL oracle:
  * DuckDB cannot decode JPEG, and the decoded bytes are
  * codec-implementation-defined rather than arithmetically derivable.
  */
object JpegCodec {

  /** Encode a grayscale raster as a real JPEG (TYPE_BYTE_GRAY →
    * baseline JFIF via the JDK writer).
    */
  def encode(p: PgmCodec.Pgm): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      p.width, p.height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, p.width, p.height, p.pixels)
    val bos = new ByteArrayOutputStream()
    val ok = ImageIO.write(img, "jpg", bos)
    if (!ok) throw new IllegalStateException("no JPEG writer available")
    bos.toByteArray
  }

  /** Decode JPEG bytes to a grayscale raster. Fails loudly on
    * undecodable input — same contract as [[PgmCodec.decode]]: a
    * decode stage that zero-fills corrupt media poisons every feature
    * downstream.
    */
  def decode(bytes: Array[Byte]): PgmCodec.Pgm = decodeGray(bytes, "JPEG")

  /** Shared `javax.imageio` decode-to-grayscale path — [[PngCodec]]
    * rides the identical seam (ImageIO sniffs the container from the
    * payload's magic bytes, so one reader serves every registered
    * format).
    */
  private[functions] def decodeGray(bytes: Array[Byte], what: String): PgmCodec.Pgm = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable $what payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    val gray =
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val gfx = g.createGraphics()
        try gfx.drawImage(img, 0, 0, null) finally gfx.dispose()
        g
      }
    val pixels = gray.getRaster
      .getDataElements(0, 0, w, h, null).asInstanceOf[Array[Byte]]
    PgmCodec.Pgm(w, h, 255, pixels)
  }
}
