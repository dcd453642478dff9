package graft.functions

/** Minimal pure-JVM codec for the RIFF/WAVE PCM format — the public,
  * spec-documented container every audio pipeline starts from: a
  * `RIFF` header enclosing little-endian chunks (`fmt ` describing the
  * stream, `data` carrying the samples, with odd-sized chunks padded
  * to even offsets). This is a REAL parser: it walks the chunk list,
  * skips unknown chunks (the encoder deliberately emits a `LIST` chunk
  * so the skip path is always exercised), validates the format block
  * against PCM 16-bit consistency rules (byteRate, blockAlign), and
  * fails loudly on malformation — a decode stage that zero-fills
  * corrupt audio poisons every feature downstream.
  *
  * The audio analog of [[PgmCodec]]: payload bytes wrap into a valid
  * mono 16-bit 8 kHz WAV (sample i = (byte_i − 128) << 8, the standard
  * unsigned-8-bit → signed-16-bit PCM widening), so an all-ASCII text
  * corpus becomes a deterministic, SQL-reconstructable waveform and
  * the decoded features are oracle-pinnable. A compressed codec (MP3,
  * Opus) would replace this at the same seam.
  */
object WavCodec {

  /** A decoded PCM stream; `samples` is interleaved (mono here). */
  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       samples: Array[Short])

  val SampleRate = 8000
  val BitsPerSample = 16
  private val ListChunkBody = "INFOISFT".getBytes("US-ASCII")

  private def le16(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Wrap `payload` into a valid mono 16-bit PCM WAV at [[SampleRate]]:
    * one sample per payload byte, widened `(b − 128) << 8`. Emits a
    * `LIST` metadata chunk between `fmt ` and `data` so decoders must
    * really walk chunks rather than assume the canonical 44-byte
    * layout.
    */
  def encode(payload: Array[Byte]): Array[Byte] = {
    val nSamples = payload.length
    val dataSize = nSamples * 2
    val listSize = ListChunkBody.length
    val out = java.nio.ByteBuffer.allocate(12 + 24 + (8 + listSize) + 8 + dataSize)
    out.put("RIFF".getBytes("US-ASCII"))
    out.put(le32(out.capacity() - 8))
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII"))
    out.put(le32(16))
    out.put(le16(1)) // PCM
    out.put(le16(1)) // mono
    out.put(le32(SampleRate))
    out.put(le32(SampleRate * 2)) // byteRate = rate · blockAlign
    out.put(le16(2)) // blockAlign = channels · bits/8
    out.put(le16(BitsPerSample))
    out.put("LIST".getBytes("US-ASCII"))
    out.put(le32(listSize))
    out.put(ListChunkBody)
    out.put("data".getBytes("US-ASCII"))
    out.put(le32(dataSize))
    var i = 0
    while (i < nSamples) {
      val s = ((payload(i) & 0xff) - 128) << 8
      out.put((s & 0xff).toByte)
      out.put(((s >> 8) & 0xff).toByte)
      i += 1
    }
    out.array()
  }

  /** Parse a RIFF/WAVE byte stream. Throws `IllegalArgumentException`
    * with a specific message on any malformation: bad magic, truncated
    * chunk, missing/duplicate `fmt `/`data`, non-PCM format, or a
    * format block whose byteRate/blockAlign contradict its own fields.
    */
  def decode(bytes: Array[Byte]): Wav = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WAV at byte $pos: $msg")
    def u16(at: Int): Int =
      (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    def u32(at: Int): Long =
      (bytes(at) & 0xffL) | ((bytes(at + 1) & 0xffL) << 8) |
        ((bytes(at + 2) & 0xffL) << 16) | ((bytes(at + 3) & 0xffL) << 24)
    def fourCC(at: Int): String =
      new String(bytes, at, 4, "US-ASCII")

    if (bytes.length < 12) fail("shorter than a RIFF header")
    if (fourCC(0) != "RIFF") fail("missing RIFF magic")
    val riffSize = u32(4)
    if (riffSize + 8 > bytes.length)
      fail(s"RIFF size $riffSize exceeds the ${bytes.length}-byte input")
    if (fourCC(8) != "WAVE") fail("RIFF form is not WAVE")
    pos = 12

    var rate = -1
    var channels = -1
    var bits = -1
    var samples: Array[Short] = null
    val end = (riffSize + 8).toInt
    while (pos + 8 <= end) {
      val id = fourCC(pos)
      val size = u32(pos + 4)
      val body = pos + 8
      if (size > end - body) fail(s"chunk '$id' of $size bytes truncated")
      id match {
        case "fmt " =>
          if (rate >= 0) fail("duplicate fmt chunk")
          if (size < 16) fail(s"fmt chunk of $size bytes (need 16)")
          val audioFormat = u16(body)
          if (audioFormat != 1) fail(s"audio format $audioFormat is not PCM")
          channels = u16(body + 2)
          rate = u32(body + 4).toInt
          val byteRate = u32(body + 8)
          val blockAlign = u16(body + 12)
          bits = u16(body + 14)
          if (channels <= 0) fail(s"non-positive channel count $channels")
          if (rate <= 0) fail(s"non-positive sample rate $rate")
          if (bits != 16) fail(s"$bits bits/sample unsupported (PCM16 only)")
          if (blockAlign != channels * bits / 8)
            fail(s"blockAlign $blockAlign contradicts $channels ch × $bits bit")
          if (byteRate != rate.toLong * blockAlign)
            fail(s"byteRate $byteRate contradicts rate $rate × blockAlign $blockAlign")
        case "data" =>
          if (samples != null) fail("duplicate data chunk")
          if (rate < 0) fail("data chunk before fmt chunk")
          if (size % 2 != 0) fail(s"odd data size $size for 16-bit samples")
          val n = (size / 2).toInt
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = u16(body + 2 * i).toShort; i += 1 }
        case _ => // unknown chunk (LIST, fact, …): skip — real WAVs carry these
      }
      pos = body + size.toInt + (size.toInt & 1) // chunks pad to even offsets
    }
    if (rate < 0) fail("no fmt chunk")
    if (samples == null) fail("no data chunk")
    Wav(rate, channels, bits, samples)
  }

  /** Per-stream features, all exact integer arithmetic so the oracle
    * can recompute them from the source bytes: sample count, peak
    * absolute amplitude, total energy (Σ s², exact in Long), count of
    * low-amplitude samples (|s| < `silenceThreshold`), and onset count
    * (adjacent-sample jumps ≥ `onsetThreshold` — a step-change
    * activity measure).
    */
  final case class AudioStats(nSamples: Int, peakAbs: Int, energy: Long,
                              nSilent: Long, nOnsets: Long)

  def stats(w: Wav, silenceThreshold: Int, onsetThreshold: Int): AudioStats = {
    var peak = 0
    var energy = 0L
    var silent = 0L
    var onsets = 0L
    var i = 0
    while (i < w.samples.length) {
      val s = w.samples(i).toInt
      val a = math.abs(s)
      if (a > peak) peak = a
      energy += s.toLong * s
      if (a < silenceThreshold) silent += 1
      if (i > 0 && math.abs(s - w.samples(i - 1).toInt) >= onsetThreshold)
        onsets += 1
      i += 1
    }
    AudioStats(w.samples.length, peak, energy, silent, onsets)
  }

  /** Fixed-length frame energies (last frame may be short): frame f
    * covers samples [f·frameLen, min((f+1)·frameLen, n)) and reports
    * (frameLen actually covered, Σ s² over the frame) — the unit the
    * voiced/unvoiced gate and any downstream VAD consume.
    */
  def frameEnergies(w: Wav, frameLen: Int): Array[(Int, Long)] = {
    require(frameLen > 0, s"frame length must be positive, got $frameLen")
    val n = w.samples.length
    val nFrames = (n + frameLen - 1) / frameLen
    val out = new Array[(Int, Long)](nFrames)
    var f = 0
    while (f < nFrames) {
      val from = f * frameLen
      val to = math.min(from + frameLen, n)
      var e = 0L
      var i = from
      while (i < to) { val s = w.samples(i).toLong; e += s * s; i += 1 }
      out(f) = (to - from, e)
      f += 1
    }
    out
  }
}
