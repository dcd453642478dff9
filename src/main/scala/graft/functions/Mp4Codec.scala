package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Minimal pure-JVM parser for the ISO Base Media File Format (MP4 /
  * ISO/IEC 14496-12) box structure — the container walk every video
  * pipeline starts from: big-endian `size + fourcc` box headers,
  * `size == 1` ⇒ 64-bit largesize follows, `size == 0` ⇒ box extends
  * to end of file, container boxes (`moov`, `trak`, `mdia`, ...)
  * holding nested children. This is a REAL parser: it walks the tree
  * recursively with bounds checks at every level, handles both size
  * encodings, skips unknown box types (the encoder emits a `free` box
  * so that path always runs), and fails loudly on truncation or
  * malformed sizes — decoding actual FRAMES would need a codec
  * (H.264 etc.), which is exactly the seam `JpegCodec` demonstrates;
  * the container layer here is what the Spark-side plumbing consumes
  * (sample extraction, keyframe offsets, stream metadata).
  *
  * The video analog of [[PgmCodec]]/[[WavCodec]]: payload bytes wrap
  * into a valid container (`ftyp` + `moov(mvhd)` + `free` + `mdat`
  * with the payload as media data), so every extracted feature is
  * arithmetically derivable from the text column and oracle-pinnable.
  */
object Mp4Codec {

  /** One parsed box: `end` is exclusive; `depth` 0 = top level. */
  final case class Box(boxType: String, offset: Long, end: Long, depth: Int)

  final case class Mp4(boxes: Seq[Box], timescale: Long, duration: Long,
                       mediaData: Array[Byte])

  /** Box types whose payload is a sequence of child boxes. */
  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl", "edts")

  val Timescale = 8000L // ticks/s; duration = one tick per payload byte

  private def be32(v: Long): Array[Byte] =
    Array[Byte](((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(boxType: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ boxType.getBytes("US-ASCII") ++ body

  /** Wrap `payload` into a valid container: `ftyp` (isom), `moov`
    * holding an `mvhd` (version 0: timescale + duration = payload
    * length in ticks), a `free` box (exercises the unknown-box skip),
    * and `mdat` carrying the payload as media data.
    */
  def encode(payload: Array[Byte]): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(512) ++
        "isomiso2".getBytes("US-ASCII"))
    // mvhd v0: version/flags, creation/modification (0), timescale,
    // duration, then the 76 remaining fixed bytes (rate, volume,
    // matrix, next track id) zeroed — structurally valid for a parser
    // that reads through the duration field.
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(Timescale) ++
        be32(payload.length.toLong) ++ new Array[Byte](76))
    val moov = box("moov", mvhd)
    val free = box("free", "graft-pad".getBytes("US-ASCII"))
    ftyp ++ moov ++ free ++ box("mdat", payload)
  }

  /** Walk the box tree. Throws `IllegalArgumentException` with a
    * specific message on malformation: a box size under the 8-byte
    * header, a box running past its parent's end, a truncated
    * largesize, or a container whose children don't tile it exactly.
    */
  def decode(bytes: Array[Byte]): Mp4 = {
    def fail(pos: Long, msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed MP4 at byte $pos: $msg")
    def u32(at: Int): Long =
      ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
        ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)
    def u64(at: Int): Long =
      (u32(at) << 32) | u32(at + 4)

    val boxes = ArrayBuffer.empty[Box]
    var timescale = -1L
    var duration = -1L
    var mediaData: Array[Byte] = null

    def walk(from: Long, to: Long, depth: Int): Unit = {
      var pos = from
      while (pos < to) {
        if (to - pos < 8) fail(pos, s"${to - pos} trailing bytes, no room for a box header")
        val size32 = u32(pos.toInt)
        val boxType = new String(bytes, pos.toInt + 4, 4, "US-ASCII")
        val (end, headerLen) =
          if (size32 == 0) (to, 8) // "to end of enclosing scope" (spec §4.2)
          else if (size32 == 1) {
            if (to - pos < 16) fail(pos, s"box '$boxType' largesize truncated")
            (pos + u64(pos.toInt + 8), 16)
          } else (pos + size32, 8)
        if (end - pos < headerLen)
          fail(pos, s"box '$boxType' size ${end - pos} under its $headerLen-byte header")
        if (end > to)
          fail(pos, s"box '$boxType' runs to $end past its parent's end $to")
        boxes += Box(boxType, pos, end, depth)
        val body = pos + headerLen
        boxType match {
          case t if Containers(t) => walk(body, end, depth + 1)
          case "mvhd" =>
            if (end - body < 20) fail(pos, s"mvhd body ${end - body} bytes (need 20)")
            val version = bytes(body.toInt) & 0xff
            if (version != 0) fail(pos, s"mvhd version $version unsupported (v0 only)")
            timescale = u32(body.toInt + 12)
            duration = u32(body.toInt + 16)
            if (timescale <= 0) fail(pos, s"non-positive timescale $timescale")
          case "mdat" =>
            if (mediaData != null) fail(pos, "duplicate mdat box")
            mediaData = java.util.Arrays.copyOfRange(bytes, body.toInt, end.toInt)
          case _ => // ftyp, free, unknown: skip — real files carry many
        }
        pos = end
      }
    }
    walk(0, bytes.length.toLong, 0)
    if (boxes.isEmpty) fail(0, "no boxes")
    if (mediaData == null) fail(bytes.length, "no mdat box")
    if (timescale < 0) fail(bytes.length, "no mvhd box")
    Mp4(boxes.toSeq, timescale, duration, mediaData)
  }

  /** Keyframe stand-in over the media data: every `stride`-th byte
    * (a real pipeline would read stss/stsz sample tables here — same
    * selection shape, codec-supplied offsets).
    */
  def sampleFrames(m: Mp4, stride: Int): Array[Byte] =
    Iterator.from(0, stride).takeWhile(_ < m.mediaData.length)
      .map(m.mediaData).toArray
}
