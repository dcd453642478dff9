package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{PgmCodec, WavCodec}

/** Multimodal-column plumbing: media treated as opaque `binary`
  * payloads with typed metadata, plus a decode / resize /
  * feature-extract / frame-sample stage.
  *
  * The decode stage is REAL: each payload is wrapped into a valid
  * Netpbm P5 (PGM) container and decoded back through
  * [[graft.functions.PgmCodec]] — an actual header-parsing,
  * comment-honoring, fail-loud binary image parser (the container has
  * no JPEG/PNG libs; PGM is the public format a pure JVM can parse in
  * ~80 lines). Resize is a true nearest-neighbor resample of the
  * decoded 2-D raster, and the feature vector is a 16-bin gray
  * histogram of the resized image. A JPEG decoder would replace
  * `PgmCodec.decode` at the same seam with no plan change: binary
  * columns in, partition-batched typed transform (`mapPartitions`, the
  * Scala analog of a Pandas-UDF batch), typed `Dataset` out.
  *
  * Scale: all queries are narrow per-row/per-partition transforms — no
  * shuffle at all until the final presentation sort, which at 100 TB
  * would be dropped (sinks don't need order).
  */
object Multimodal {

  /** Minimum qualifying silent-run length (samples) for
    * mm_silence_spans — 6 samples = 0.75 ms at the 8 kHz synth rate.
    */
  val MinSilenceSpan = 6L

  /** Keyframe stand-in: every `stride`-th byte of the raw payload
    * starting at `offset` (a video container would yield I-frames
    * here; the selection/batching shape is what carries over).
    */
  def sampleFrames(payload: Array[Byte], stride: Int, offset: Int = 0): Array[Byte] =
    Iterator.from(offset, stride).takeWhile(_ < payload.length).map(payload).toArray

  final case class MediaFeature(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      max_val: Int,
      pixel_sum: Long,
      pixels: Array[Byte],
      features: Array[Float],
      resized: Array[Byte],
      frame_sample: Array[Byte])

  /** Typed partition-batched encode → DECODE (real PGM parse) →
    * resize → feature-extract → frame-sample pipeline over binary
    * payloads.
    *
    * `keepRaster = false` drops the decoded full raster from the
    * output rows (empty `pixels`): the feature/frame queries consume
    * only the 8×8 resize, histogram and frame sample, and carrying a
    * payload-sized column they immediately discard would double their
    * per-row serialization. Only `mm_decode_pgm`, which checksums the
    * raster itself, asks for it.
    */
  /** (doc_id, payload) spread across the session's full parallelism.
    * A small landing file yields ONE input split, which serializes
    * every CPU-bound codec call on a single core (measured: the JPEG
    * leg ran 2.6× slower than its parallel plan at sf0.1). Decode
    * cost scales with bytes, not splits — repartitioning first is the
    * production shape: a 100 TB media ingest wants decode throughput
    * ∝ cores regardless of how the landing files were sized. The
    * shuffle moves exactly the payload bytes once, far below the
    * decode CPU it unlocks.
    */
  /** md5-hex of a built string against a per-partition digest — THE
    * hashing convention of every lossless-chain pin in this file
    * (UTF-8 bytes, lowercase hex). One definition so a charset or
    * format change can't be applied to one row and not another.
    */
  private def md5HexOf(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  private def payloads(s: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
  }

  def extractFeatures(s: SparkSession, dir: String,
                      keepRaster: Boolean = false): Dataset[MediaFeature] = {
    import s.implicits._
    payloads(s, dir)
      .mapPartitions(_.map { case (id, payload) =>
        val img = PgmCodec.decode(PgmCodec.encode(payload))
        val small = PgmCodec.resize(img, 8, 8)
        var sum = 0L
        var i = 0
        while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 1 }
        MediaFeature(id, payload.length, img.width, img.height, img.maxVal,
          sum, if (keepRaster) img.pixels else Array.emptyByteArray,
          PgmCodec.grayHistogram(small.pixels, 16),
          small.pixels, sampleFrames(payload, stride = 16))
      })
  }

  /** The per-clip loudness-gain plan behind mm_wav_gain (see that
    * query's comment for the squared-domain algebra): (n_samples,
    * sumsq, gain2_ppm, n_clip, needs_limiter). An all-silent clip
    * (Σs² = 0 — no finite gain reaches the RMS target) yields NULLs
    * for the plan columns on BOTH engines rather than an
    * engine-divergent divide-by-zero.
    */
  private[graft] def wavGainOf(payload: Array[Byte])
      : (Long, Long, Option[Long], Option[Long], Option[Boolean]) = {
    val w = WavCodec.decode(WavCodec.encode(payload))
    val n = w.samples.length.toLong
    var sumsq = 0L
    w.samples.foreach { sm => sumsq += sm.toLong * sm }
    if (sumsq == 0L) (n, sumsq, None, None, None)
    else {
      val t2n = BigInt(67108864L) * n // 8192² · n
      val gain2 = ((t2n * 1000000L) / sumsq).toLong
      // clip iff s²·t2n > 32767²·Σs² ⟺ s² > ⌊32767²·Σs²/t2n⌋ —
      // one BigInt division per clip, the sample loop stays Long
      val thr = ((BigInt(1073676289L) * sumsq) / t2n).toLong
      var nClip = 0L
      w.samples.foreach { sm => if (sm.toLong * sm > thr) nClip += 1 }
      (n, sumsq, Some(gain2), Some(nClip), Some(nClip > 0))
    }
  }

  /** aHash near-dup pairs (hamming <= 3), shared by mm_phash_pairs
    * and mm_phash_clusters — see the mm_phash_pairs comment for the
    * banding/pigeonhole argument. Round 11: the hashes now come off
    * REAL PNG FILES on disk ([[phashHashesFromFiles]]) — the
    * image-dedup flagship's input is the `binaryFile` scan, not a
    * query-time wrap of the text column. PNG is lossless, so the
    * decoded raster equals the arithmetic reconstruction and the
    * text-derived DuckDB oracle pins the whole
    * files→decode→hash→pairs chain unchanged.
    */
  private def phashPairs(s: SparkSession, dir: String): DataFrame =
    phashPairsFrom(phashHashesFromFiles(s, dir))

  /** (doc_id, ph) off the FULL-corpus PNG landing: land every doc as
    * a genuine .png once per (session, dir), ingest via `binaryFile`,
    * decode the actual PNG bytes (JDK imageio), and compute the
    * sampled-grid aHash with EXACTLY the text path's indexing —
    * pix(i) = raster((i/8)·h/8 · 8 + i%8) — so the unchanged
    * arithmetic oracle still pins it. The decoded hash frame (one
    * (long, long) row per doc) is materialized once per (session,
    * dir) through [[graft.CacheRegistry]] — both phash rows and any
    * downstream consumer read the checkpoint blocks instead of
    * re-scanning 5k small files each; the per-run cost of the real
    * file→decode→hash stage stays a measured bench number via
    * mm_png_files, which runs its subset scan fresh every execution
    * (the dd_simhash64_build bypass convention). At 100 TB the
    * landing is the media lake itself and this frame is the
    * fingerprint table you'd materialize next to it.
    */
  private val phashCache = graft.CacheRegistry.newCache()
  private def phashHashesFromFiles(s: SparkSession, dir: String): DataFrame =
    graft.CacheRegistry.cached[DataFrame](phashCache, s, dir, "phashHashes") {
      import s.implicits._
      val out = tmp("png_all_" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
      ensureLandingOnce(s, dir, out) {
        landFiles(s, dir, out, "true", "png")(b =>
          graft.functions.PngCodec.encode(PgmCodec.decode(PgmCodec.encode(b))))
      }
      s.read.format("binaryFile").load(out)
        .select(regexp_extract(col("path"), "(\\d+)\\.png$", 1)
            .cast("long").as("doc_id"),
          col("content"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, png) =>
          val img = graft.functions.PngCodec.decode(png)
          val h = img.height
          val pix = new Array[Int](64)
          var psum = 0L
          var i = 0
          while (i < 64) {
            pix(i) = img.pixels((i / 8 * h / 8) * 8 + i % 8) & 0xff
            psum += pix(i)
            i += 1
          }
          var ph = 0L
          i = 0
          while (i < 64) {
            // ascending-index adds match the SQL fold: bit 63's weight
            // is Long.MIN and lands last, so partials never overflow
            if (64L * pix(i) > psum) ph += (1L << i)
            i += 1
          }
          (id, ph)
        })
        .toDF("doc_id", "ph")
        .localCheckpoint(false)
    }

  /** Banded aHash pair generation from a precomputed (doc_id, ph)
    * frame — shared by the text-wrapped path above and the real-file
    * path (mm_png_files), whose hashes come off decoded PNG bytes.
    */
  private def phashPairsFrom(hashes: DataFrame): DataFrame = {
    val banded = hashes.select(col("doc_id"), col("ph"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("band_idx"),
          expr(s"(ph >> ${16 * j}) & 65535").as("band_val"))): _*)).as("bd"))
      .select(col("doc_id"), col("ph"),
        col("bd.band_idx").as("band_idx"), col("bd.band_val").as("band_val"))
    PairGen.saltedPairs(
        banded.select(col("band_idx"), col("band_val"),
          struct(col("doc_id"), col("ph")).as("v")),
        Seq("band_idx", "band_val"), "doc_id")
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.ph ^ b.ph) AS INT)").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
  }

  /** Per-process landing root for the real-file leg (the
    * SourceQueries.tmp pattern: unique per JVM so concurrent runs
    * can't race each other's overwrite-then-read).
    */
  private val runId = java.util.UUID.randomUUID().toString.take(8)
  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_mm_$runId/$name"

  /** Subset predicate for the real-file leg: ~1/8 of the corpus by
    * md5 prefix (78 files at sf0.01, 659 at sf0.1) — enough to carry
    * real duplicate clusters without an I/O-bound bench row.
    */
  private val PngSubsetPred = "substring(md5(CAST(doc_id AS STRING)), 1, 4) < '2000'"

  /** mm_frame_diff's frame model: 64-byte frames, cut at SAD ≥ 2000
    * (the corpus's ~P85; intra-shot SAD floors near 900).
    */
  val FrameBytes = 64
  val CutSad = 2000L

  /** Real-file landings verified complete this JVM: repeat runs skip
    * the expected-count job + recursive listing (≈0.5 s each on the
    * bench's min-of-2). Safe because landing content is deterministic
    * per (dir, doc) and the source corpus is immutable for a process
    * lifetime — the same assumption [[graft.Tables]]' handle cache
    * makes; a driver-side testdata rewrite goes through
    * `Tables.invalidate`, which clears this set too via
    * [[graft.CacheRegistry]].
    */
  private val landingCache = graft.CacheRegistry.newCache()
  private def ensureLandingOnce(s: SparkSession, dir: String, out: String)(
      ensure: => Unit): Unit =
    graft.CacheRegistry.cached[java.lang.Boolean](
      landingCache, s, dir, s"landing|$out") { ensure; java.lang.Boolean.TRUE }
  private val PngSubsetPredSql = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '2000'"

  /** Shared real-file landing: write `make(text bytes)` for every doc
    * matching `pred` to `$out/shard=XX/<doc_id>.<ext>` (md5-prefix
    * shards, no crc sidecars — the src_binaryfile_meta ingest shape).
    * Idempotent: file content is deterministic per (dir, doc), so an
    * existing COMPLETE landing (counted by extension) is reused and
    * repeat runs measure the production shape — ingest of files that
    * already exist; an incomplete dir (crashed writer) is rebuilt from
    * scratch. Callers wrap this in [[ensureLandingOnce]] so the
    * count-and-list completeness check itself runs once per (session,
    * dir).
    */
  private def landFiles(s: SparkSession, dir: String, out: String,
      pred: String, ext: String)(make: Array[Byte] => Array[Byte]): Unit = {
    import s.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(out)
    val fs0 = root.getFileSystem(conf.value)
    val expected = Tables.documents(s, dir).filter(expr(pred)).count()
    val suffix = "." + ext
    val complete = fs0.exists(root) && {
      val it = fs0.listFiles(root, true)
      var n = 0L
      while (it.hasNext) {
        // a crash between fs.create and os.write leaves a 0-byte
        // file — require non-empty so a truncated landing is rebuilt
        // instead of poisoning every later session's decode rows
        val f = it.next()
        if (f.getPath.getName.endsWith(suffix) && f.getLen > 0) n += 1
      }
      n == expected
    }
    if (fs0.exists(root) && !complete) fs0.delete(root, true)
    if (!complete) Tables.documents(s, dir)
      .filter(expr(pred))
      .select(col("doc_id").cast("long"), col("text"),
        substring(md5(col("doc_id").cast("string")), 1, 2).as("shard"))
      .repartition(col("shard"))
      .as[(Long, String, String)]
      .foreachPartition { (it: Iterator[(Long, String, String)]) =>
        val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf.value)
        fs.setWriteChecksum(false)
        it.foreach { case (id, text, shard) =>
          val bytes = make(text.getBytes("UTF-8"))
          val p = new org.apache.hadoop.fs.Path(s"$out/shard=$shard/$id$suffix")
          val os = fs.create(p, true)
          try os.write(bytes) finally os.close()
        }
      }
  }

  /** Sidecar path of the JPEG landing the CURRENT process last built
    * — read by [[oracleSql]] at dump time (graft.Verify runs every
    * query, which sets this, BEFORE dumping oracle_sql.json), so the
    * driver's DuckDB gate compares the fresh decode against the
    * landing-time pin instead of skipping the row. The default is a
    * nonexistent path so a dump taken without running the query fails
    * loudly in DuckDB rather than silently passing.
    */
  private val jpegSidecar = new java.util.concurrent.atomic.AtomicReference[String](
    "/graft_jpeg_sidecar_never_landed")

  /** PNG landing dir the CURRENT process last built — same
    * dump-time-assembly contract as [[jpegSidecar]]: the
    * mm_png_chunks oracle re-walks these exact files in DuckDB, and
    * the never-landed default makes a query-less dump fail loudly.
    */
  private val pngChunkLanding = new java.util.concurrent.atomic.AtomicReference[String](
    "/graft_png_landing_never_landed")

  /** Ensure the shared real-PNG subset landing exists (idempotent,
    * once per (session, dir)) and return its path — ONE definition of
    * the dir/predicate/encode chain so mm_png_files and mm_png_chunks
    * provably walk the same files.
    */
  private def pngSubsetLanding(s: SparkSession, dir: String): String = {
    val out = tmp("png_" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
    ensureLandingOnce(s, dir, out) {
      landFiles(s, dir, out, PngSubsetPred, "png")(b =>
        graft.functions.PngCodec.encode(PgmCodec.decode(PgmCodec.encode(b))))
    }
    out
  }

  /** The mm_decode_jpeg pipeline off the real .jpg landing: ingest
    * via `binaryFile`, decode the actual JPEG bytes (JDK imageio),
    * join the documents table for the arithmetically-reconstructable
    * source raster, and report reconstruction-error statistics + the
    * decoded-pixel md5. Runs FRESH on every execution — the landing
    *-time sidecar run and the per-query run must agree byte-for-byte
    * for the oracle row to pass (decode determinism + file
    * integrity), and dims are pinned cross-engine by arithmetic.
    */
  private def jpegDecodeFromFiles(s: SparkSession, dir: String,
      out: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").load(out)
      .select(regexp_extract(col("path"), "(\\d+)\\.jpg$", 1)
          .cast("long").as("doc_id"),
        col("content"))
      .join(Tables.documents(s, dir).select(col("doc_id"), col("text")), "doc_id")
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, jpeg, text) =>
        val src = PgmCodec.decode(PgmCodec.encode(text.getBytes("UTF-8")))
        val dec = graft.functions.JpegCodec.decode(jpeg)
        var sumErr = 0L
        var maxErr = 0
        val n = math.min(src.pixels.length, dec.pixels.length)
        var i = 0
        while (i < n) {
          val e = math.abs((src.pixels(i) & 0xff) - (dec.pixels(i) & 0xff))
          sumErr += e
          if (e > maxErr) maxErr = e
          i += 1
        }
        (id, jpeg.length.toLong, dec.width, dec.height, sumErr, maxErr,
          dec.pixels)
      })
      .toDF("doc_id", "n_jpeg_bytes", "width", "height",
        "sum_abs_err", "max_abs_err", "dec_pixels")
      .select(col("doc_id"), col("n_jpeg_bytes"), col("width"), col("height"),
        col("sum_abs_err"), col("max_abs_err"),
        md5(col("dec_pixels")).as("pixels_md5"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // REAL BINARY FILES end-to-end (round-9 mandate): every other mm_*
    // row wraps text bytes into a valid container AT QUERY TIME; this
    // row writes genuine .png files to disk (sharded layout, no crc
    // sidecars — the src_binaryfile_meta ingest shape), reads them
    // back through the `binaryFile` DataSource, DECODES the actual
    // PNG bytes (JDK imageio), and runs the full image-dedup leg —
    // aHash → banded pairs → connected components — off the decoded
    // rasters. PNG is lossless, so the oracle pins the whole chain
    // from the documents table: pixels_md5 must equal the
    // arithmetically reconstructed raster's md5 (one wrong byte
    // anywhere in encode→write→read→decode flips it), and the
    // clusters must equal the text-derived aHash clustering on the
    // same subset. Scale: the write is one pass of payload-sized
    // rows; the read is the binaryFile scan; decode+hash is a narrow
    // mapPartitions; pairs/CC ride the banded PairGen machinery.
    "mm_png_files" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      // idempotent landing ([[pngSubsetLanding]]); the whole
      // check-and-build runs ONCE per (session, dir). Unlike the
      // phash rows, the scan + decode below runs FRESH every
      // execution — this row is the cache-bypassing construction
      // measurement for the real-file decode stage (the
      // dd_simhash64_build convention).
      val out = pngSubsetLanding(s, dir)
      val decoded = s.read.format("binaryFile").load(out)
        .select(regexp_extract(col("path"), "(\\d+)\\.png$", 1)
            .cast("long").as("doc_id"),
          col("content"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, png) =>
          val img = graft.functions.PngCodec.decode(png)
          val small = PgmCodec.resize(img, 8, 8)
          var sum = 0L
          var i = 0
          while (i < 64) { sum += small.pixels(i) & 0xff; i += 1 }
          var ph = 0L
          i = 0
          while (i < 64) {
            // ascending-index adds match the SQL fold: bit 63's weight
            // is Long.MIN and lands last, so partials never overflow
            if (64L * (small.pixels(i) & 0xff) > sum) ph += (1L << i)
            i += 1
          }
          (id, img.height, ph, img.pixels)
        })
        .toDF("doc_id", "height", "ph", "pixels")
        .select(col("doc_id"), col("height"), col("ph"),
          md5(col("pixels")).as("pixels_md5"))
        .localCheckpoint(false) // files decode once; pairs + labels reuse
      val labels = DedupClusters.connectedComponents(
        phashPairsFrom(decoded.select(col("doc_id"), col("ph")))
          .select("doc_a", "doc_b"))
      decoded.join(labels, decoded("doc_id") === labels("id"), "left")
        .select(col("doc_id"), col("height").cast("int").as("height"),
          col("pixels_md5"),
          coalesce(col("label"), col("doc_id")).as("cluster_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .orderBy("doc_id")
    }),

    // REAL BINARY FILES, audio leg — the WAV dual of mm_png_files
    // (round-9 mandate extended to the second modality): genuine
    // .wav files land on disk once (sharded, no crc sidecars), come
    // back through the `binaryFile` source, and the RIFF parser
    // decodes the actual bytes. PCM is lossless, so the oracle pins
    // the WHOLE chain from the documents table: the recovered payload
    // (samples narrowed back to bytes) must md5-equal the original
    // text — one wrong byte anywhere in encode→write→read→decode
    // flips the hash — and energy/peak re-derive from the synth
    // formula. Same idempotent-landing discipline as the PNG leg.
    "mm_wav_files" -> ((s, dir) => {
      import s.implicits._
      val out = tmp("wav_" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
      ensureLandingOnce(s, dir, out) {
        landFiles(s, dir, out, PngSubsetPred, "wav")(WavCodec.encode(_))
      }
      s.read.format("binaryFile").load(out)
        .select(regexp_extract(col("path"), "(\\d+)\\.wav$", 1)
            .cast("long").as("doc_id"),
          col("content"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val w = WavCodec.decode(bytes)
          var energy = 0L
          var peak = 0
          val payload = new Array[Byte](w.samples.length)
          var i = 0
          while (i < w.samples.length) {
            val sm = w.samples(i)
            energy += sm.toLong * sm
            if (math.abs(sm.toInt) > peak) peak = math.abs(sm.toInt)
            payload(i) = ((sm / 256) + 128).toByte
            i += 1
          }
          (id, w.samples.length.toLong, energy, peak.toLong, payload)
        })
        .toDF("doc_id", "n_samples", "energy", "peak_abs", "payload")
        .select(col("doc_id"), col("n_samples"), col("energy"),
          col("peak_abs"), md5(col("payload")).as("payload_md5"))
        .orderBy("doc_id")
    }),

    // PNG CONTAINER AUDIT — the chunk-level structure walk of the
    // REAL .png landing (the mm_png_files files), from two fully
    // independent walkers: Spark parses length/type/data/CRC chunk
    // frames off the raw bytes, VERIFIES every CRC32 (fail-loud — a
    // flipped bit anywhere in a chunk kills the query, not just a
    // pixel) and requires the walk to consume the file exactly; the
    // oracle re-walks the SAME files in DuckDB via read_blob + a
    // recursive CTE over the hex string (big-endian lengths decoded
    // by positional nibble arithmetic — the hex13 idiom). Storage
    // audit rationale: every downstream decode trusts container
    // framing the way src_parquet_meta trusts footers; this row makes
    // the framing itself a gated claim. Census per file: chunk count,
    // IDAT count/bytes (multi-IDAT files are legal and real), IHDR
    // dims. Narrow per-file map over the shared idempotent landing.
    "mm_png_chunks" -> ((s, dir) => {
      import s.implicits._
      val out = pngSubsetLanding(s, dir)
      pngChunkLanding.set(out)
      s.read.format("binaryFile").load(out)
        .select(regexp_extract(col("path"), "(\\d+)\\.png$", 1)
            .cast("long").as("doc_id"),
          col("content"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, b) =>
          def be32(o: Int): Long =
            ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
              ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
          require(b.length > 8 && (b(0) & 0xff) == 0x89 &&
            b(1) == 'P' && b(2) == 'N' && b(3) == 'G',
            s"bad PNG signature for doc $id")
          val crc = new java.util.zip.CRC32
          var off = 8
          var nChunks = 0L; var nIdat = 0L; var idatBytes = 0L
          var w = 0L; var h = 0L
          var sawEnd = false
          while (!sawEnd) {
            require(off + 12 <= b.length, s"truncated chunk header, doc $id")
            val len = be32(off)
            require(len >= 0 && off + 12 + len <= b.length,
              s"chunk overruns file, doc $id")
            val typ = new String(b, off + 4, 4, "US-ASCII")
            crc.reset()
            crc.update(b, off + 4, 4 + len.toInt)
            require(crc.getValue == be32(off + 8 + len.toInt),
              s"CRC mismatch on $typ, doc $id")
            nChunks += 1
            if (typ == "IDAT") { nIdat += 1; idatBytes += len }
            if (typ == "IHDR") { w = be32(off + 8); h = be32(off + 12) }
            if (typ == "IEND") sawEnd = true
            off += 12 + len.toInt
          }
          require(off == b.length, s"trailing bytes after IEND, doc $id")
          (id, b.length.toLong, nChunks, nIdat, idatBytes, w, h)
        })
        .toDF("doc_id", "n_bytes", "n_chunks", "n_idat", "idat_bytes",
          "width", "height")
        .orderBy("doc_id")
    }),

    // Metadata over opaque binary payloads: byte length, checksum,
    // derived "dimensions", frame count, first-frame sample hash.
    "mm_meta" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          md5(col("text")).as("checksum"),
          (lit(64) + octet_length(col("text")) % 512).cast("int").as("width"),
          (lit(64) + (octet_length(col("text")) * 7) % 512).cast("int").as("height"),
          (lit(1) + expr("octet_length(text) div 64")).cast("int").as("n_frames"),
          md5(substring(col("text"), 1, 32)).as("frame0_checksum"))
        .orderBy("doc_id")
    }),

    // The decode stage itself, oracle-pinned: container dimensions,
    // maxval, pixel count/sum, and an md5 over the decoded raster. The
    // oracle reconstructs the raster byte-exactly in SQL (all-ASCII
    // corpus + space padding ⇒ raster == rpad(text, w·h, ' ')), so a
    // parser bug of even one byte shows up as a hash mismatch.
    "mm_decode_pgm" -> ((s, dir) => {
      extractFeatures(s, dir, keepRaster = true).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("max_val"),
          (col("width") * col("height")).cast("int").as("n_pixels"),
          col("pixel_sum"),
          md5(col("pixels")).as("pixels_checksum"))
        .orderBy("doc_id")
    }),

    // JPEG leg of the decode seam — the in-JDK `javax.imageio` codec
    // doing a REAL lossy round trip, round 11 ON REAL FILES WITH A
    // VERIFIABLE CONTRACT: genuine .jpg files land on disk once per
    // (session, dir) over the md5-prefix subset (the mm_wav_files
    // discipline), and the landing ALSO runs the decode pipeline once
    // and pins its result as a sidecar parquet. The per-run query
    // re-ingests the files via `binaryFile` and re-decodes FRESH;
    // the oracle joins the sidecar (decode determinism + file
    // integrity — one flipped byte anywhere in
    // encode→write→read→decode moves pixels_md5/err) against
    // ARITHMETIC dims from the documents table (8 × ⌈len/8⌉ — a
    // Spark-side dimension bug diverges from SQL even though the
    // sidecar came from this engine). Lossy pixel bytes themselves
    // stay codec-defined; the error-bound ScalaTests
    // (MultimodalJpegSpec) still pin plausibility.
    "mm_decode_jpeg" -> ((s, dir) => {
      val out = tmp("jpeg_" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
      ensureLandingOnce(s, dir, out) {
        landFiles(s, dir, out, PngSubsetPred, "jpg")(b =>
          graft.functions.JpegCodec.encode(PgmCodec.decode(PgmCodec.encode(b))))
        jpegDecodeFromFiles(s, dir, out).write.mode("overwrite")
          .parquet(out + "_sidecar")
      }
      jpegSidecar.set(out + "_sidecar")
      jpegDecodeFromFiles(s, dir, out).orderBy("doc_id")
    }),

    // PNG leg of the decode seam — completes the production image
    // triple (PGM, JPEG, PNG) through the same partition-batched
    // path, and because PNG is LOSSLESS this one is ORACLE-PINNED
    // (not exempt like JPEG): the checksum comes from the raster
    // AFTER the PNG encode→decode round trip, so it must equal the
    // arithmetically reconstructed source raster byte for byte — a
    // one-byte codec bug is a hash mismatch. (The PNG byte size is
    // encoder-implementation-defined, so it stays out of the oracle
    // row; the spec pins the signature bytes instead.)
    "mm_decode_png" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val src = PgmCodec.decode(PgmCodec.encode(payload))
          val dec = graft.functions.PngCodec.decode(
            graft.functions.PngCodec.encode(src))
          var sum = 0L
          var i = 0
          while (i < dec.pixels.length) { sum += dec.pixels(i) & 0xff; i += 1 }
          (id, dec.width, dec.height, dec.width * dec.height, sum, dec.pixels)
        })
        .toDF("doc_id", "width", "height", "n_pixels", "pixel_sum", "pixels")
        .select(col("doc_id"), col("width"), col("height"),
          col("n_pixels").cast("int").as("n_pixels"), col("pixel_sum"),
          md5(col("pixels")).as("pixels_checksum"))
        .orderBy("doc_id")
    }),

    // Audio leg of the decode seam — payload bytes wrap into a REAL
    // mono 16-bit PCM WAV (RIFF container with an interposed LIST
    // chunk, so decode exercises true chunk-walking) and decode back
    // through WavCodec; per-stream features are exact integer
    // arithmetic over the samples, so the oracle re-derives every
    // column from the text bytes ((ord − 128) · 256 per char) — the
    // parser is pinned end to end, not shape-tested.
    "mm_audio_wav" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val w = WavCodec.decode(WavCodec.encode(payload))
          val st = WavCodec.stats(w, silenceThreshold = 16384, onsetThreshold = 4096)
          (id, st.nSamples, st.nSamples * 1000L / w.sampleRate,
            st.peakAbs, st.energy, st.nSilent, st.nOnsets)
        })
        .toDF("doc_id", "n_samples", "duration_ms", "peak_abs", "energy",
          "n_silent", "n_onsets")
        .withColumn("rms4",
          when(col("n_samples") > 0,
            round(sqrt(col("energy").cast("double") / col("n_samples")), 4))
            .otherwise(lit(0.0)))
        .withColumn("silence_ratio4",
          when(col("n_samples") > 0,
            round(col("n_silent").cast("double") / col("n_samples"), 4))
            .otherwise(lit(0.0)))
        .drop("n_silent")
        .orderBy("doc_id")
    }),

    // Frame-level audio analysis (the VAD/windowing shape): 160-sample
    // (20 ms @ 8 kHz) frames, exact per-frame energy, voiced = mean
    // square ≥ 12288² as an integer cross-multiplication. Per-doc
    // totals keep the query a narrow map — no explode, no shuffle.
    "mm_audio_frames" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val w = WavCodec.decode(WavCodec.encode(payload))
          val frames = WavCodec.frameEnergies(w, frameLen = 160)
          var voiced = 0L
          var maxE = 0L
          frames.foreach { case (covered, e) =>
            if (e >= covered.toLong * 12288L * 12288L) voiced += 1
            if (e > maxE) maxE = e
          }
          (id, frames.length.toLong, voiced, maxE)
        })
        .toDF("doc_id", "total_frames", "voiced_frames", "max_frame_energy")
        .orderBy("doc_id")
    }),

    // MORPHOLOGICAL EROSION — the third classical vision family after
    // convolution (sobel) and labeling (blobs): a bright pixel
    // survives iff it is INTERIOR (all four 4-neighbors in bounds)
    // and its full 4-neighborhood is bright — the noise-strip /
    // boundary-peel primitive that turns a speckled mask into its
    // core (one erode before blob counting kills 1-pixel noise).
    // Pure boolean integer logic on the same decode map as every
    // image row; the oracle re-derives each neighborhood test from
    // raster-position arithmetic (the sobel pattern). Survivors are
    // a subset of bright by construction — the census shows the peel.
    "mm_pgm_erode" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val px = PgmCodec.decode(PgmCodec.encode(payload)).pixels
          val n = px.length
          val h = n / 8
          def bright(i: Int) = (px(i) & 0xff) >= 115
          var nBright = 0L
          var nEroded = 0L
          var i = 0
          while (i < n) {
            if (bright(i)) {
              nBright += 1
              val (x, y) = (i % 8, i / 8)
              if (x > 0 && x < 7 && y > 0 && y < h - 1 &&
                  bright(i - 1) && bright(i + 1) &&
                  bright(i - 8) && bright(i + 8)) nEroded += 1
            }
            i += 1
          }
          (id, nBright, nEroded, nBright - nEroded)
        })
        .toDF("doc_id", "n_bright", "n_survivors", "n_peeled")
        .orderBy("doc_id")
    }),

    // OTSU GLOBAL THRESHOLD — the automatic binarization every
    // fixed-threshold row (erode/blobs at 115) hand-waves: pick the
    // per-image threshold t maximizing between-class variance
    // σ_B²(t) = (s0·n − s·w0)² / (w0·w1·n²) over the 256-bin gray
    // histogram (Otsu 1979). All integer: the score lands in micro
    // via one BigInt cross-multiply per candidate (num² ≈ 255²·n⁴
    // overflows int64 past ~10³ pixels — the MicroDomainLintSpec
    // class, BigInt/HUGEINT-routed on both engines), argmax ties to
    // the smallest t. The strict-improvement scan makes the winner
    // always a PRESENT gray value (the score is constant between
    // consecutive present values and each run starts at one), which
    // is exactly the candidate set the oracle enumerates — the
    // histogram-sized argmax, not a 256-way unnest per pixel. A
    // degenerate single-value image has no valid split and yields
    // NULLs on both engines. Narrow per-row map like every decode
    // row; the histogram is image-local state (256 longs).
    "mm_pgm_otsu" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val px = PgmCodec.decode(PgmCodec.encode(payload)).pixels
          val n = px.length.toLong
          val hist = new Array[Long](256)
          var i = 0
          while (i < px.length) { hist(px(i) & 0xff) += 1; i += 1 }
          var total = 0L
          i = 0
          while (i < 256) { total += i.toLong * hist(i); i += 1 }
          var s0 = 0L; var w0 = 0L
          var bestT = -1; var bestScore = -1L; var bestW0 = 0L
          var t = 0
          while (t < 255) {
            w0 += hist(t); s0 += t.toLong * hist(t)
            if (w0 > 0L && w0 < n) {
              val num = BigInt(s0) * n - BigInt(total) * w0
              val score = ((num * num * 1000000L) /
                (BigInt(w0) * (n - w0) * n * n)).toLong
              if (score > bestScore) {
                bestScore = score; bestT = t; bestW0 = w0
              }
            }
            t += 1
          }
          if (bestT < 0)
            (id, None: Option[Int], None: Option[Long],
              None: Option[Long], None: Option[Long])
          else
            (id, Some(bestT), Some(bestW0), Some(n - bestW0),
              Some(bestScore))
        })
        .toDF("doc_id", "otsu_t", "n_below", "n_above", "sb2_micro")
        .orderBy("doc_id")
    }),

    // BLOB LABELING — per-image connected components over bright
    // pixels (threshold 115, 4-connectivity): the object-counting
    // primitive of every vision pipeline (count regions, reject
    // fragmented scans, size the largest object), and deliberately
    // the IMAGE-LOCAL twin of the corpus-level dd_clusters operator —
    // same min-label semantics, but here the graph is bounded by ONE
    // image so the right tool is a per-row union-find inside the
    // decode map (narrow, no shuffle, no iteration count), while the
    // oracle reuses the recursive min-label CTE. label_sum = Σ over
    // blobs of the blob's minimum pixel index — a structure checksum
    // that pins the LABELING, not just the census.
    "mm_pgm_blobs" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val img = PgmCodec.decode(PgmCodec.encode(payload))
          val n = img.pixels.length
          val bright = new Array[Boolean](n)
          var nBright = 0L
          var i = 0
          while (i < n) {
            if ((img.pixels(i) & 0xff) >= 115) { bright(i) = true; nBright += 1 }
            i += 1
          }
          val parent = Array.tabulate(n)(identity)
          def find(a: Int): Int = {
            var r = a
            while (parent(r) != r) r = parent(r)
            var c = a
            while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
            r
          }
          def union(a: Int, b: Int): Unit = {
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          i = 0
          while (i < n) {
            if (bright(i)) {
              val (x, y) = (i % 8, i / 8)
              if (x > 0 && bright(i - 1)) union(i, i - 1)
              if (y > 0 && bright(i - 8)) union(i, i - 8)
            }
            i += 1
          }
          val sizes = scala.collection.mutable.Map.empty[Int, Long]
          i = 0
          while (i < n) {
            if (bright(i)) {
              val r = find(i)
              sizes(r) = sizes.getOrElse(r, 0L) + 1L
            }
            i += 1
          }
          val nBlobs = sizes.size.toLong
          val maxBlob = if (sizes.isEmpty) 0L else sizes.values.max
          val labelSum = sizes.keys.map(_.toLong).sum
          (id, nBright, nBlobs, maxBlob, labelSum)
        })
        .toDF("doc_id", "n_bright", "n_blobs", "max_blob", "label_sum")
        .orderBy("doc_id")
    }),

    // WALSH–HADAMARD band energies — the engine's first FREQUENCY-
    // domain audio feature, chosen because the 8-point WHT's basis is
    // ±1 (Sylvester order, sign = (−1)^popcount(k & j)): every
    // coefficient is an exact integer sum/difference of the block's
    // samples, so the whole spectral decomposition is cross-engine
    // checkable where an FFT's twiddle factors would drag libm in.
    // Per doc: full 8-sample blocks (trailing partial dropped), the 8
    // per-band energy sums Σ c_k², and Parseval's identity
    // Σ_k c_k² = 8·Σ s² carried as an ok flag — an engine that breaks
    // the transform flips the flag before it flips a hash. Headroom:
    // |c_k| ≤ 8·2¹⁵ so c² ≤ 2³⁷ per block — BIGINT to ~2²⁶ blocks per
    // doc. Same narrow decode map as every audio row.
    "mm_wav_wht" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val w = WavCodec.decode(WavCodec.encode(payload))
          val n = w.samples.length / 8
          val e = new Array[Long](8)
          var tot = 0L
          var b = 0
          while (b < n) {
            var k = 0
            while (k < 8) {
              var c = 0L
              var j = 0
              while (j < 8) {
                val sv = w.samples(b * 8 + j).toLong
                if (java.lang.Integer.bitCount(k & j) % 2 == 0) c += sv
                else c -= sv
                j += 1
              }
              e(k) += c * c
              k += 1
            }
            var j = 0
            while (j < 8) {
              val sv = w.samples(b * 8 + j).toLong
              tot += sv * sv
              j += 1
            }
            b += 1
          }
          val ok = if (e.sum == 8L * tot) 1L else 0L
          (id, n.toLong, e(0), e(1), e(2), e(3), e(4), e(5), e(6), e(7), ok)
        })
        .toDF("doc_id", "n_blocks", "e0", "e1", "e2", "e3", "e4", "e5",
          "e6", "e7", "parseval_ok")
        .orderBy("doc_id")
    }),

    // QUADRANT TILE FEATURES — the partial-image-duplicate primitive
    // the whole-image aHash (mm_phash_pairs) can't express: a global
    // hash changes completely when one corner is edited, but per-TILE
    // features localize the change (the region-dedup recipe: hash
    // tiles, match tile sets). Per image: the four quadrant intensity
    // sums (top/bottom split at 2·y < h, left/right at x < w/2 — all
    // integer) and the brightest quadrant with a fixed tie order.
    // Same narrow decode map as the rest of the image leg; the oracle
    // re-derives every sum from the raster synth formula.
    "mm_pgm_tiles" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val img = PgmCodec.decode(PgmCodec.encode(payload))
          val sums = new Array[Long](4)
          var i = 0
          while (i < img.pixels.length) {
            val x = i % img.width
            val y = i / img.width
            val q = (if (2 * y < img.height) 0 else 2) +
              (if (x < img.width / 2) 0 else 1)
            sums(q) += img.pixels(i) & 0xff
            i += 1
          }
          val brightest =
            if (sums(0) >= sums(1) && sums(0) >= sums(2) && sums(0) >= sums(3)) 0
            else if (sums(1) >= sums(2) && sums(1) >= sums(3)) 1
            else if (sums(2) >= sums(3)) 2
            else 3
          (id, sums(0), sums(1), sums(2), sums(3), brightest)
        })
        .toDF("doc_id", "q_tl", "q_tr", "q_bl", "q_br", "brightest")
        .orderBy("doc_id")
    }),

    // LOUDNESS-NORMALIZATION PLAN — the gain staging an audio
    // ingestion pipeline computes before mixing corpora recorded at
    // different levels: per clip, the SQUARED gain that would bring
    // RMS to the 8192 target (gain² in ppm — working in the squared
    // domain keeps the whole contract rational: gain² = target²·n /
    // Σs², no sqrt, no float), plus the count of samples that would
    // clip at that gain (s²·target²·n > 32767²·Σs², evaluated in
    // HUGEINT/BigInt since the triple product leaves BIGINT at ~2³⁸)
    // and the needs-limiter verdict. A clip-free gain plan applies
    // directly; a clipping one routes through a limiter stage. Same
    // narrow per-partition decode as the rest of the audio leg.
    "mm_wav_gain" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val (n, sumsq, gain2, nClip, lim) = wavGainOf(payload)
          (id, n, sumsq, gain2, nClip, lim)
        })
        .toDF("doc_id", "n_samples", "sumsq", "gain2_ppm", "n_clip",
          "needs_limiter")
        .orderBy("doc_id")
    }),

    // HISTOGRAM EQUALIZATION — the classic contrast-normalization
    // pass of image preprocessing (remap each pixel through the
    // image's own CDF so intensities spread over the full range):
    // nv = ⌊(cdf(p) − cdf_min)·255 / (n − cdf_min)⌋, flat images
    // (n = cdf_min) map to 0. The report is the before/after contrast
    // budget — dynamic range and n²-scaled variance (exact integers:
    // varn = n·Σp² − (Σp)², no division, no sqrt) — the numbers a
    // vision-ingest gate reads to decide whether normalization is
    // worth a re-encode. Per-image bounded work (≤256-entry CDF),
    // same narrow per-partition decode map as the rest of the leg.
    "mm_pgm_equalize" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val img = PgmCodec.decode(PgmCodec.encode(payload))
          val n = img.pixels.length.toLong
          val hist = new Array[Long](256)
          img.pixels.foreach(p => hist(p & 0xff) += 1)
          val cdf = new Array[Long](256)
          var acc = 0L
          var v = 0
          while (v < 256) { acc += hist(v); cdf(v) = acc; v += 1 }
          var minV = 0
          while (minV < 255 && hist(minV) == 0) minV += 1
          var maxV = 255
          while (maxV > 0 && hist(maxV) == 0) maxV -= 1
          val cmin = cdf(minV)
          var sB = 0L; var sB2 = 0L; var sA = 0L; var sA2 = 0L
          var minN = 255L; var maxN = 0L
          v = minV
          while (v <= maxV) {
            if (hist(v) > 0) {
              val nv = if (n > cmin) (cdf(v) - cmin) * 255 / (n - cmin)
                else 0L
              sB += hist(v) * v; sB2 += hist(v) * v * v
              sA += hist(v) * nv; sA2 += hist(v) * nv * nv
              if (nv < minN) minN = nv
              if (nv > maxN) maxN = nv
            }
            v += 1
          }
          (id, n, (maxV - minV).toLong, maxN - minN,
            n * sB2 - sB * sB, n * sA2 - sA * sA)
        })
        .toDF("doc_id", "n_pixels", "range_before", "range_after",
          "varn_before", "varn_after")
        .orderBy("doc_id")
    }),

    // SOBEL EDGE CENSUS — the first real convolution in the image
    // leg: per image, the 3×3 integer Sobel operator over every
    // interior pixel of the decoded raster, reporting interior count,
    // L1 gradient mass (Σ|gx|+|gy|), the peak gradient, and the count
    // of edge pixels (g ≥ 128). Edge density is the image-quality
    // signal a vision-data pipeline gates on (blank/flat images have
    // near-zero mass; dense text scans spike), and the census is
    // integer-exact: byte pixels, integer kernel taps, |·|+|·|
    // magnitude — no float anywhere. Same narrow per-partition decode
    // map as the rest of the leg (a convolution never crosses image
    // boundaries, so rows stay independent); the oracle re-derives
    // each tap by raster-position arithmetic on the synth formula.
    // 2× BOX-FILTER DOWNSCALE — the resize leg of the briefed
    // decode/feature/resize/frame-sample quartet: each output pixel
    // is the integer mean of its 2×2 source box ((Σ4) DIV 4 — all
    // non-negative, so DIV ≡ //), odd trailing rows dropped (the
    // floor-dims convention every box-filter pyramid uses). The
    // whole resized raster is pinned by an md5 over the
    // comma-joined decimal pixel values in row-major order — one
    // flipped pixel anywhere moves the row — plus mass conservation
    // stats (sum_out ≤ sum_in by flooring, recomputed exactly in
    // SQL). Same narrow decode map as the rest of the image leg.
    "mm_pgm_resize" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { case (id, payload) =>
            val img = PgmCodec.decode(PgmCodec.encode(payload))
            val h2 = img.height / 2
            val sb = new StringBuilder
            var sumOut = 0L
            var y = 0
            while (y < h2) {
              var x = 0
              while (x < 4) {
                val v = ((img.pixels(2 * y * 8 + 2 * x) & 0xff) +
                  (img.pixels(2 * y * 8 + 2 * x + 1) & 0xff) +
                  (img.pixels((2 * y + 1) * 8 + 2 * x) & 0xff) +
                  (img.pixels((2 * y + 1) * 8 + 2 * x + 1) & 0xff)) / 4
                sumOut += v
                if (sb.nonEmpty) sb.append(',')
                sb.append(v)
                x += 1
              }
              y += 1
            }
            (id, 4, h2.toLong, 4L * h2, sumOut, md5HexOf(md, sb.toString))
          }
        }
        .toDF("doc_id", "w_out", "h_out", "n_out", "sum_out", "resized_md5")
        .orderBy("doc_id")
    }),

    // RUN-LENGTH ENCODING of the raster — the simplest lossless image
    // codec, and the one whose OUTPUT is fully integer-checkable
    // cross-engine (deflate's bitstream is library-defined; RLE's is
    // arithmetic). Encoded form: "ord,len;ord,len;…" over the
    // row-major raster bytes, reported as run count, longest run, and
    // the md5 of the encoding (the lossless-chain pin — the oracle
    // rebuilds the identical string from boundary positions). Narrow
    // per-row map like every decode row: at 100 TB the encode runs
    // inside the scan task, no shuffle before the presentation sort.
    "mm_rle_encode" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { case (id, payload) =>
            val px = PgmCodec.decode(PgmCodec.encode(payload)).pixels
            val sb = new StringBuilder
            var nRuns = 0L
            var maxRun = 0L
            var i = 0
            while (i < px.length) {
              var j = i
              while (j < px.length && px(j) == px(i)) j += 1
              val len = j - i
              if (sb.nonEmpty) sb.append(';')
              sb.append(px(i) & 0xff).append(',').append(len)
              nRuns += 1
              if (len > maxRun) maxRun = len.toLong
              i = j
            }
            (id, px.length.toLong, nRuns, maxRun, md5HexOf(md, sb.toString))
          }
        }
        .toDF("doc_id", "n_bytes", "n_runs", "max_run", "rle_md5")
        .orderBy("doc_id")
    }),

    "mm_pgm_sobel" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val img = PgmCodec.decode(PgmCodec.encode(payload))
          val w = img.width
          val h = img.height
          def p(x: Int, y: Int): Int = img.pixels(y * w + x) & 0xff
          var nInt = 0L; var gradSum = 0L; var maxG = 0L; var nEdge = 0L
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val gx = (p(x + 1, y - 1) + 2 * p(x + 1, y) + p(x + 1, y + 1)) -
                (p(x - 1, y - 1) + 2 * p(x - 1, y) + p(x - 1, y + 1))
              val gy = (p(x - 1, y + 1) + 2 * p(x, y + 1) + p(x + 1, y + 1)) -
                (p(x - 1, y - 1) + 2 * p(x, y - 1) + p(x + 1, y - 1))
              val g = math.abs(gx) + math.abs(gy)
              nInt += 1
              gradSum += g
              if (g > maxG) maxG = g
              if (g >= 128) nEdge += 1
              x += 1
            }
            y += 1
          }
          (id, nInt, gradSum, maxG, nEdge)
        })
        .toDF("doc_id", "n_interior", "grad_sum", "max_grad", "n_edges")
        .orderBy("doc_id")
    }),

    // SILENCE-SPAN SEGMENTATION — the run-length dimension the
    // sample-count silence ratio (mm_audio_wav) and frame VAD
    // (mm_audio_frames) don't expose: maximal runs of consecutive
    // silent samples of length ≥ MinSilenceSpan, i.e. the split
    // points an ASR pipeline cuts long audio at ("segment at pauses
    // ≥ N ms"). Per stream: qualifying span count, the longest span,
    // and total samples inside qualifying spans — all integer run
    // arithmetic off the same decoded samples, so the oracle
    // re-derives them from the text bytes via the island trick
    // (run id = position − rank within silent rows). A narrow
    // per-row map like the rest of the audio leg: state is one run
    // counter, never a materialized sample table.
    "mm_silence_spans" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val w = WavCodec.decode(WavCodec.encode(payload))
          var i = 0; var run = 0L
          var n = 0L; var mx = 0L; var tot = 0L
          def close(): Unit = {
            if (run >= MinSilenceSpan) {
              n += 1; tot += run; if (run > mx) mx = run
            }
            run = 0L
          }
          while (i < w.samples.length) {
            if (math.abs(w.samples(i).toInt) < 16384) run += 1 else close()
            i += 1
          }
          close()
          (id, n, mx, tot)
        })
        .toDF("doc_id", "n_spans", "max_span", "silent_in_spans")
        .orderBy("doc_id")
    }),

    // Video leg of the decode seam — a REAL ISO BMFF (MP4) container
    // parse: payloads wrap into ftyp + moov(mvhd) + free + mdat and
    // walk back through Mp4Codec's recursive box parser (64-bit
    // largesize and size-0 handling, unknown-box skip via the free
    // box, fail-loud bounds checks). Frame decoding proper would need
    // an H.264-class codec (the seam JpegCodec demonstrates); the
    // container walk is what the pipeline plumbing consumes. Box
    // census, media-data length, tick-exact duration and the sampled
    // "keyframe" checksum are all arithmetically derivable from the
    // text bytes, so the parser is oracle-pinned end to end.
    "mm_video_mp4" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Mp4Codec
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val m = Mp4Codec.decode(Mp4Codec.encode(payload))
          (id, m.boxes.length, m.boxes.count(_.depth == 0),
            m.mediaData.length, m.duration * 1000L / m.timescale,
            Mp4Codec.sampleFrames(m, 32))
        })
        .toDF("doc_id", "n_boxes", "n_top_boxes", "mdat_bytes",
          "duration_ms", "frames")
        .select(col("doc_id"), col("n_boxes"), col("n_top_boxes"),
          col("mdat_bytes"), col("duration_ms"),
          octet_length(col("frames")).cast("long").as("n_frames"),
          md5(col("frames")).as("frames_checksum"))
        .orderBy("doc_id")
    }),

    // SCENE-CHANGE DETECTION — the shot-boundary pass a video
    // ingestion pipeline runs before frame sampling (sample per SHOT,
    // not per second, or long static shots dominate the training
    // set): the decoded mdat payload is read as consecutive 64-byte
    // frames, consecutive frames compared by exact SAD
    // (Σ|b_i − b'_i|, the block-matching metric hardware encoders
    // use), and a cut declared at SAD ≥ 2000 (the corpus's ~P85 —
    // comfortably above the intra-shot noise floor). Integer end to
    // end; per-doc rows stay independent (a diff never crosses a
    // clip), so the decode+diff is the same narrow per-partition map
    // as the rest of the leg. Clips shorter than two complete frames
    // report zero diffs rather than vanishing.
    "mm_frame_diff" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Mp4Codec
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val m = Mp4Codec.decode(Mp4Codec.encode(payload))
          val d = m.mediaData
          val nFrames = d.length / FrameBytes
          var sadSum = 0L
          var sadMax = 0L
          var nCuts = 0L
          var f = 1
          while (f < nFrames) {
            var sad = 0L
            var i = 0
            while (i < FrameBytes) {
              sad += math.abs((d(f * FrameBytes + i) & 0xff) -
                (d((f - 1) * FrameBytes + i) & 0xff))
              i += 1
            }
            sadSum += sad
            if (sad > sadMax) sadMax = sad
            if (sad >= CutSad) nCuts += 1
            f += 1
          }
          (id, nFrames.toLong, math.max(nFrames - 1, 0).toLong,
            sadSum, sadMax, nCuts)
        })
        .toDF("doc_id", "n_frames", "n_diffs", "sad_sum", "sad_max",
          "n_cuts")
        .orderBy("doc_id")
    }),

    // 2× DECIMATION with a boxcar anti-alias prefilter — the sample
    // -rate normalization stage of an audio ingest (mixed-rate corpora
    // are downsampled to one rate before feature extraction):
    // out[k] = ⌊(s[2k] + s[2k+1]) / 2⌋ (arithmetic shift — FLOOR for
    // negatives on both engines, where truncating division would
    // disagree), odd tail dropped. Reports the exact energy budget:
    // the boxcar halves out-of-band energy, so energy_ratio_ppm is
    // the aliasing health number a resampler is monitored by. Same
    // narrow per-partition decode as the rest of the audio leg.
    "mm_wav_downsample" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val w = WavCodec.decode(WavCodec.encode(payload))
          val nIn = w.samples.length
          val nOut = nIn / 2
          var eIn = 0L
          w.samples.foreach { sm => eIn += sm.toLong * sm }
          var eOut = 0L
          var peak = 0L
          var k = 0
          while (k < nOut) {
            val v = (w.samples(2 * k).toLong + w.samples(2 * k + 1)) >> 1
            eOut += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            k += 1
          }
          // BigInt for the ppm cross-product: energy ≤ n·2³⁰ can
          // leave Long×10⁶ range on long clips
          (id, nIn.toLong, nOut.toLong, eIn, eOut,
            if (eIn == 0L) None: Option[Long]
            else Some((BigInt(eOut) * 1000000L / eIn).toLong), peak)
        })
        .toDF("doc_id", "n_in", "n_out", "energy_in", "energy_out",
          "energy_ratio_ppm", "peak_out")
        .orderBy("doc_id")
    }),

    // ZERO-CROSSING RATE, DC-REMOVED — the classic O(n)
    // speech/music/noise discriminator (Bachu et al. 2008: voiced
    // speech ZCR low, fricatives/noise high). The 8-bit→16-bit PCM
    // widening gives this corpus a large DC offset (all-ASCII bytes
    // < 128 ⇒ every raw sample negative ⇒ raw ZCR is identically 0 —
    // the textbook reason real pipelines high-pass before ZCR), so
    // the crossing is counted around the per-doc mean, kept EXACT by
    // integer cross-multiplication: sign(s − μ) = sign(s·n − S) with
    // S = Σs, so a crossing is (s_{i−1}·n − S)·(s_i·n − S) < 0 — no
    // division anywhere near a comparison. Two passes over the
    // decoded samples inside one narrow map; the oracle re-derives
    // every count from the text→sample synth formula. zcr_ppm =
    // crossings·10⁶ DIV (n−1) (n−1 adjacent pairs, non-negative so
    // plain DIV ≡ //).
    "mm_wav_zcr" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val w = WavCodec.decode(WavCodec.encode(payload))
          val n = w.samples.length.toLong
          var sSum = 0L
          w.samples.foreach(sm => sSum += sm)
          var nAbove = 0L
          var nBelow = 0L
          var nAt = 0L
          var crossings = 0L
          var prev = 0L
          var i = 0
          while (i < w.samples.length) {
            val d = w.samples(i).toLong * n - sSum // sign(s − μ), exact
            if (d > 0) nAbove += 1 else if (d < 0) nBelow += 1 else nAt += 1
            // d ≤ 2^15·n: the product of two stays < 2^30·n² — BigInt
            // is unnecessary below ~2^16 samples, and payloads are
            // document-sized; guard the contract with math.signum
            if (i > 0 && math.signum(prev) * math.signum(d) < 0)
              crossings += 1
            prev = d
            i += 1
          }
          (id, n, nAbove, nBelow, nAt, crossings,
            if (n > 1) Some(crossings * 1000000L / (n - 1))
            else None: Option[Long])
        })
        .toDF("doc_id", "n_samples", "n_above", "n_below", "n_at_mean",
          "n_crossings", "zcr_ppm")
        .orderBy("doc_id")
    }),

    // INTEGRAL IMAGE (summed-area table, Crow 1984 / Viola–Jones) —
    // the O(1)-box-sum precompute behind Haar features and fast box
    // blur: sat(x,y) = Σ pixels in [0,x]×[0,y], any rectangle read
    // back as 4 corner lookups. The map builds the SAT per image and
    // reads the four quadrant boxes THROUGH the corner algebra (plus
    // the full-frame box = total) — the oracle computes the same
    // quadrants as direct conditional sums, so a wrong SAT recurrence
    // or corner sign shows up as a value mismatch, not a shape one.
    // Per-row state is one image's SAT; the quadrants tile the frame,
    // so q_tl+q_tr+q_bl+q_br = total by construction (pinned in
    // Round18OpsSpec).
    "mm_pgm_integral" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val px = PgmCodec.decode(PgmCodec.encode(payload)).pixels
          val w = 8
          val h = px.length / 8
          val sat = Array.ofDim[Long](h + 1, w + 1) // 1-based, zero border
          var y = 0
          while (y < h) {
            var x = 0
            var rowSum = 0L
            while (x < w) {
              rowSum += px(y * 8 + x) & 0xff
              sat(y + 1)(x + 1) = sat(y)(x + 1) + rowSum
              x += 1
            }
            y += 1
          }
          def box(x1: Int, y1: Int, x2: Int, y2: Int): Long =
            sat(y2 + 1)(x2 + 1) - sat(y1)(x2 + 1) -
              sat(y2 + 1)(x1) + sat(y1)(x1)
          val ym = h / 2 // top rows [0, ym), bottom [ym, h)
          (id, box(0, 0, 7, h - 1),
            box(0, 0, 3, ym - 1), box(4, 0, 7, ym - 1),
            box(0, ym, 3, h - 1), box(4, ym, 7, h - 1))
        })
        .toDF("doc_id", "total", "q_tl", "q_tr", "q_bl", "q_br")
        .orderBy("doc_id")
    }),

    // ADAPTIVE (LOCAL-MEAN) THRESHOLDING — the binarization that
    // survives uneven illumination where any global threshold (fixed
    // 115, or mm_pgm_otsu's optimum) fails: an interior pixel is
    // foreground iff it exceeds the MEAN of its 3×3 neighborhood,
    // kept exact by cross-multiplication (9·v > Σ₉ — no division
    // near a comparison, the zcr discipline). excess = 9·v − Σ₉ in
    // ninths gives the margin census. Same interior domain as sobel
    // (x ∈ [1,6], y ∈ [1,h−2]); narrow per-row map, 9 taps per pixel
    // — at production resolutions the box mean comes off
    // mm_pgm_integral's SAT in O(1) per pixel regardless of window
    // size, which is why the two rows ship together.
    "mm_pgm_adaptive" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val px = PgmCodec.decode(PgmCodec.encode(payload)).pixels
          val h = px.length / 8
          def v(x: Int, y: Int): Long = (px(y * 8 + x) & 0xff).toLong
          var nInterior = 0L; var nAbove = 0L
          var maxExcess = Long.MinValue; var sumExcess = 0L
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < 7) {
              var s9 = 0L
              var dy = -1
              while (dy <= 1) {
                var dx = -1
                while (dx <= 1) { s9 += v(x + dx, y + dy); dx += 1 }
                dy += 1
              }
              val excess = 9L * v(x, y) - s9
              nInterior += 1
              if (excess > 0) { nAbove += 1; sumExcess += excess }
              if (excess > maxExcess) maxExcess = excess
              x += 1
            }
            y += 1
          }
          (id, nInterior, nAbove, sumExcess,
            if (nInterior == 0) None: Option[Long] else Some(maxExcess))
        })
        .toDF("doc_id", "n_interior", "n_above_local", "sum_excess",
          "max_excess")
        .orderBy("doc_id")
    }),

    // AUTOCORRELATION PITCH PROBE — the time-domain fundamental-
    // frequency estimator (the core of YIN/ACF pitch trackers):
    // R(L) = Σ s_i·s_{i+L} over candidate lags L ∈ [2, 13], winner =
    // argmax (ties to the smallest lag — the octave-error-averse
    // choice), reported with the zero-lag energy R(0) and the
    // normalized peak r_ppm = R(L*)·10⁶/R(0) ∈ [−10⁶, 10⁶] (the
    // voicing-confidence dial a VAD thresholds; sign-explicit
    // division — R(L) can be negative on noise — and BigInt-routed,
    // since R·10⁶ wraps int64 past ~10⁴-sample clips). All exact
    // integer products of the synth samples inside the same narrow
    // decode map as zcr; the oracle re-derives R(L) as a per-(doc,
    // lag) self-join on sample index — the declarative form whose
    // O(n·|lags|) pair volume is exactly the map's work.
    "mm_wav_pitch" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir)
        .mapPartitions(_.map { case (id, payload) =>
          val w = WavCodec.decode(WavCodec.encode(payload))
          val sm = w.samples
          val n = sm.length
          var r0 = 0L
          var i = 0
          while (i < n) { r0 += sm(i).toLong * sm(i); i += 1 }
          var bestLag = -1
          var bestR = Long.MinValue
          var lag = 2
          while (lag <= 13) {
            var r = 0L
            var j = 0
            while (j + lag < n) { r += sm(j).toLong * sm(j + lag); j += 1 }
            if (r > bestR) { bestR = r; bestLag = lag }
            lag += 1
          }
          val rppm =
            if (r0 == 0L) None
            else Some(((BigInt(bestR).abs * 1000000L) / r0).toLong *
              (if (bestR < 0) -1L else 1L))
          (id, bestLag, r0, bestR, rppm)
        })
        .toDF("doc_id", "best_lag", "r0", "r_lag", "r_ppm")
        .orderBy("doc_id")
    }),

    // Feature extraction through the typed mapPartitions path: 16-bin
    // gray histogram of the decoded raster resized to 8×8.
    "mm_features" -> ((s, dir) => {
      extractFeatures(s, dir).toDF()
        .select(col("doc_id"), col("n_bytes"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("features"), 16).cast("double"), 4).as("f15"))
        .orderBy("doc_id")
    }),

    // Image near-dup pairs by perceptual hash (aHash): the decoded
    // raster resizes to the mm_features 8×8 thumbnail, bit i of the
    // 64-bit hash is set iff pixel i exceeds the thumbnail mean
    // (strict, as the integer cross-multiplication 64·p > Σp — no
    // division), and candidate pairs come from 4 × 16-bit Hamming
    // bands exactly like dd_simhash64_pairs: a pair within Hamming
    // distance 3 must share a whole band (pigeonhole), so the band
    // join is a complete candidate generator for d ≤ 3, with
    // [[PairGen.saltedPairs]] bounding any clone-class mega-bucket.
    // This is the image leg of the dedup stack — byte-identical
    // payloads are caught by exact dedup; aHash catches re-encoded /
    // lightly-edited duplicates at any resolution.
    "mm_phash_pairs" -> ((s, dir) =>
      phashPairs(s, dir).orderBy("doc_a", "doc_b")),

    // The image-dedup END PRODUCT — pairs are a report, clusters are
    // what the pipeline acts on: the aHash near-dup graph collapsed
    // by the same connected-components operator the text pipeline
    // uses (dd_clusters), labeling every matched image with its
    // component minimum and size. Completes the multimodal leg
    // end-to-end: decode → thumbnail hash → banded pairs → clusters.
    "mm_phash_clusters" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      DedupClusters.connectedComponents(
          phashPairs(s, dir).select("doc_a", "doc_b"))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"),
          count(lit(1)).over(Window.partitionBy(col("label")))
            .as("cluster_size"))
        .orderBy("doc_id")
    }),

    // Frame-sampling leg of the typed pipeline: every-16th payload byte
    // (keyframe stand-in), checksummed. The oracle re-derives the exact
    // byte selection by character indexing (all-ASCII corpus ⇒ char
    // position = byte position) — so the mapPartitions batch path is
    // oracle-pinned end to end, not just shape-tested.
    "mm_frames" -> ((s, dir) => {
      extractFeatures(s, dir).toDF()
        .select(col("doc_id"), col("n_bytes"),
          octet_length(col("frame_sample")).cast("long").as("n_frames"),
          md5(col("frame_sample")).as("frames_checksum"))
        .orderBy("doc_id")
    })
  )

  // Shared oracle fragment: the decoded raster is text space-padded to
  // width 8 × height ⌈len/8⌉ (min 1 row) — byte-identical to what
  // PgmCodec.encode wraps and PgmCodec.decode returns.
  private def rasterSql(from: String = "documents") =
    s"""SELECT doc_id, text, length(text) AS len,
       |    greatest(1, (length(text) + 7) // 8) AS h,
       |    rpad(text, CAST(8 * greatest(1, (length(text) + 7) // 8) AS INT), ' ') AS raster
       |  FROM $from""".stripMargin

  /** Shared DuckDB CTE chain g->px->ps->ph->banded for the aHash
    * queries, and the pair SELECT over it (no ORDER BY — callers add
    * their own or feed the clusters recursion).
    */
  private def phashCtesSql(from: String = "documents"): String = {
    val phExpr = (0 until 64)
      .map(i => s"CASE WHEN 64 * pix[${i + 1}] > psum THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    val bandRows = (0 until 4)
      .map(j => s"SELECT doc_id, ph, $j AS band_idx, (ph >> ${16 * j}) & 65535 AS band_val FROM ph")
      .mkString("\n  UNION ALL\n  ")
    s"""g AS (${rasterSql(from)}),
       |px AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 64), i -> ord(substring(raster,
       |      CAST((i // 8) * h // 8 AS INT) * 8 + CAST(i % 8 AS INT) + 1, 1))) AS pix
       |  FROM g),
       |ps AS (SELECT doc_id, pix, CAST(list_sum(pix) AS BIGINT) AS psum FROM px),
       |ph AS (SELECT doc_id, $phExpr AS ph FROM ps),
       |banded AS (
       |  $bandRows
       |)""".stripMargin
  }

  private val phashPairsSelectSql: String =
    """SELECT DISTINCT doc_a, doc_b, hamming FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
      |  FROM banded a JOIN banded b
      |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
      |      AND a.doc_id < b.doc_id)
      |WHERE hamming <= 3""".stripMargin

  private val staticOracleSql: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
        |  CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height,
        |  CAST(1 + octet_length(encode(text)) // 64 AS INT) AS n_frames,
        |  md5(substring(text, 1, 32)) AS frame0_checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_decode_pgm" ->
      s"""WITH g AS (${rasterSql()}),
         |sums AS (
         |  SELECT doc_id, sum(ord(substring(text, CAST(i + 1 AS INT), 1))) AS s
         |  FROM documents, UNNEST(range(0, length(text))) AS u(i)
         |  GROUP BY doc_id)
         |SELECT g.doc_id, CAST(8 AS INT) AS width, CAST(g.h AS INT) AS height,
         |  CAST(255 AS INT) AS max_val, CAST(8 * g.h AS INT) AS n_pixels,
         |  CAST(COALESCE(s.s, 0) + 32 * (8 * g.h - g.len) AS BIGINT) AS pixel_sum,
         |  md5(g.raster) AS pixels_checksum
         |FROM g LEFT JOIN sums s ON g.doc_id = s.doc_id
         |ORDER BY g.doc_id""".stripMargin,
    // Lossless round trip ⇒ the PNG leg shares mm_decode_pgm's raster
    // reconstruction (no max_val column: the PNG container doesn't
    // carry one).
    "mm_decode_png" ->
      s"""WITH g AS (${rasterSql()}),
         |sums AS (
         |  SELECT doc_id, sum(ord(substring(text, CAST(i + 1 AS INT), 1))) AS s
         |  FROM documents, UNNEST(range(0, length(text))) AS u(i)
         |  GROUP BY doc_id)
         |SELECT g.doc_id, CAST(8 AS INT) AS width, CAST(g.h AS INT) AS height,
         |  CAST(8 * g.h AS INT) AS n_pixels,
         |  CAST(COALESCE(s.s, 0) + 32 * (8 * g.h - g.len) AS BIGINT) AS pixel_sum,
         |  md5(g.raster) AS pixels_checksum
         |FROM g LEFT JOIN sums s ON g.doc_id = s.doc_id
         |ORDER BY g.doc_id""".stripMargin,
    // The resize IS SQL-expressible on this corpus (all-ASCII, so
    // character position == byte position — asserted by the n_bytes
    // column, which would diverge otherwise): out(r, c) = raster byte
    // at (r·h÷8)·8 + c, then the 16-bin histogram bins for 0 and 15.
    // k/64 is dyadic, so float→double widening and the 4dp round agree
    // bit-exactly.
    "mm_features" ->
      s"""WITH g AS (${rasterSql()}),
         |bytes AS (
         |  SELECT doc_id, len,
         |    ord(substring(raster,
         |      CAST((i // 8) * h // 8 AS INT) * 8 + CAST(i % 8 AS INT) + 1, 1)) % 16 AS bin
         |  FROM g, UNNEST(range(0, 64)) AS u(i))
         |SELECT doc_id, CAST(max(len) AS INT) AS n_bytes,
         |  round(sum(CASE WHEN bin = 0 THEN 1 ELSE 0 END) / 64.0, 4) AS f0,
         |  round(sum(CASE WHEN bin = 15 THEN 1 ELSE 0 END) / 64.0, 4) AS f15
         |FROM bytes GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Same thumbnail indexing as mm_features; the 64 bit-weights are
    // Scala-interpolated BIGINT constants (the dd_simhash64_pairs
    // trick — bit 63's weight is Long.MIN, and the left-assoc sum adds
    // it last so no partial sum overflows).
    "mm_phash_pairs" ->
      s"""WITH ${phashCtesSql()}
         |$phashPairsSelectSql ORDER BY doc_a, doc_b""".stripMargin,
    // The real-file chain is losslessly pinned from the documents
    // table: decode(readFiles(write(encodePNG(x)))) == x, so raster
    // md5s and the aHash clustering must equal the arithmetic
    // reconstruction over the same md5-prefix subset (singletons keep
    // their own id, size 1).
    "mm_png_files" -> {
      val sub = s"(SELECT * FROM documents WHERE $PngSubsetPredSql)"
      s"""WITH RECURSIVE ${phashCtesSql(sub)},
         |pairs AS ($phashPairsSelectSql),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach AS (
         |  SELECT src AS id, dst AS r FROM edges
         |  UNION
         |  SELECT reach.id, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
         |comp AS (
         |  SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id),
         |lab AS (
         |  SELECT g.doc_id, CAST(g.h AS INT) AS height, md5(g.raster) AS pixels_md5,
         |    COALESCE(c.cluster_id, g.doc_id) AS cluster_id
         |  FROM g LEFT JOIN comp c ON g.doc_id = c.id)
         |SELECT doc_id, height, pixels_md5, cluster_id,
         |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
         |FROM lab ORDER BY doc_id""".stripMargin
    },

    // PCM is lossless and the corpus is all-ASCII bytes, so the
    // recovered payload md5 IS md5(text) and energy/peak re-derive
    // from the per-char sample synth.
    "mm_wav_files" ->
      s"""WITH sub AS (SELECT * FROM documents WHERE $PngSubsetPredSql),
         |v AS (
         |  SELECT doc_id,
         |    CAST((ord(substring(text, CAST(i + 1 AS INT), 1)) - 128) * 256
         |      AS BIGINT) AS s
         |  FROM sub, UNNEST(range(0, length(text))) AS u(i)),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
         |    CAST(sum(s * s) AS BIGINT) AS energy,
         |    CAST(max(abs(s)) AS BIGINT) AS peak_abs
         |  FROM v GROUP BY 1)
         |SELECT d.doc_id, a.n_samples, a.energy, a.peak_abs,
         |  md5(d.text) AS payload_md5
         |FROM sub d JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // dd_clusters' recursive min-label CC over the aHash pair graph.
    "mm_phash_clusters" ->
      s"""WITH RECURSIVE ${phashCtesSql()},
         |pairs AS ($phashPairsSelectSql),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach AS (
         |  SELECT src AS id, dst AS r FROM edges
         |  UNION
         |  SELECT reach.id, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
         |comp AS (
         |  SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id)
         |SELECT a.id AS doc_id, a.cluster_id, b.cluster_size
         |FROM comp a
         |JOIN (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1) b
         |  USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
    // The wrap emits exactly ftyp, moov(mvhd), free, mdat; duration =
    // one 8000 Hz tick per payload byte; frames = every 32nd byte
    // (all-ASCII corpus ⇒ char position = byte position).
    "mm_video_mp4" ->
      """SELECT doc_id,
        |  CAST(5 AS INT) AS n_boxes,
        |  CAST(4 AS INT) AS n_top_boxes,
        |  CAST(length(text) AS INT) AS mdat_bytes,
        |  CAST(length(text) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST((length(text) + 31) // 32 AS BIGINT) AS n_frames,
        |  md5(array_to_string(
        |    list_transform(range(0, (length(text) + 31) // 32),
        |                   i -> substring(text, CAST(i * 32 + 1 AS INT), 1)),
        |    '')) AS frames_checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mdat bytes == text bytes, so frames and SADs are pure byte
    // arithmetic on the text column.
    "mm_frame_diff" ->
      s"""WITH f AS (
         |  SELECT doc_id, i // $FrameBytes AS fr, i % $FrameBytes AS off,
         |    ord(substring(text, CAST(i + 1 AS INT), 1)) AS b
         |  FROM documents,
         |    UNNEST(range(0, (length(text) // $FrameBytes) * $FrameBytes))
         |      AS u(i)),
         |sad AS (
         |  SELECT a.doc_id, a.fr, CAST(sum(abs(a.b - p.b)) AS BIGINT) AS sad
         |  FROM f a JOIN f p
         |    ON p.doc_id = a.doc_id AND p.fr = a.fr - 1 AND p.off = a.off
         |  GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_diffs,
         |    CAST(sum(sad) AS BIGINT) AS sad_sum,
         |    CAST(max(sad) AS BIGINT) AS sad_max,
         |    CAST(sum(CASE WHEN sad >= $CutSad THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_cuts
         |  FROM sad GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(length(d.text) // $FrameBytes AS BIGINT) AS n_frames,
         |  COALESCE(a.n_diffs, 0) AS n_diffs,
         |  COALESCE(a.sad_sum, 0) AS sad_sum,
         |  COALESCE(a.sad_max, 0) AS sad_max,
         |  COALESCE(a.n_cuts, 0) AS n_cuts
         |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // Decimation mirrors the sample synth formula; // is floor on
    // both engines (the Scala side shifts, which is also floor).
    "mm_wav_downsample" ->
      """WITH v AS (
        |  SELECT doc_id, i,
        |    CAST((ord(substring(text, CAST(i + 1 AS INT), 1)) - 128) * 256
        |      AS BIGINT) AS s
        |  FROM documents, UNNEST(range(0, length(text))) AS u(i)),
        |din AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_in,
        |    CAST(sum(s * s) AS BIGINT) AS energy_in
        |  FROM v GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id, (a.s + b.s) // 2 AS o
        |  FROM v a JOIN v b
        |    ON b.doc_id = a.doc_id AND a.i % 2 = 0 AND b.i = a.i + 1),
        |dout AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_out,
        |    CAST(sum(o * o) AS BIGINT) AS energy_out,
        |    CAST(max(abs(o)) AS BIGINT) AS peak_out
        |  FROM pairs GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(i.n_in, 0) AS n_in,
        |  COALESCE(o.n_out, 0) AS n_out,
        |  COALESCE(i.energy_in, 0) AS energy_in,
        |  COALESCE(o.energy_out, 0) AS energy_out,
        |  CASE WHEN COALESCE(i.energy_in, 0) = 0 THEN NULL
        |    ELSE CAST((CAST(COALESCE(o.energy_out, 0) AS HUGEINT) * 1000000)
        |      // i.energy_in AS BIGINT) END AS energy_ratio_ppm,
        |  COALESCE(o.peak_out, 0) AS peak_out
        |FROM documents d
        |LEFT JOIN din i ON i.doc_id = d.doc_id
        |LEFT JOIN dout o ON o.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // DC-removed crossings: sign(s − μ) ≡ sign(s·n − S) exactly.
    "mm_wav_zcr" ->
      """WITH v AS (
        |  SELECT doc_id, i,
        |    CAST((ord(substring(text, CAST(i + 1 AS INT), 1)) - 128) * 256
        |      AS BIGINT) AS s
        |  FROM documents, UNNEST(range(0, length(text))) AS u(i)),
        |t AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(s) AS BIGINT) AS ssum
        |  FROM v GROUP BY doc_id),
        |d AS (
        |  SELECT v.doc_id, v.i, v.s * t.n - t.ssum AS dd
        |  FROM v JOIN t ON v.doc_id = t.doc_id),
        |l AS (
        |  SELECT doc_id, i, dd,
        |    lag(dd) OVER (PARTITION BY doc_id ORDER BY i) AS pd
        |  FROM d),
        |c AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_above,
        |    CAST(sum(CASE WHEN dd < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_below,
        |    CAST(sum(CASE WHEN dd = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_at_mean,
        |    CAST(sum(CASE WHEN i > 0 AND sign(pd) * sign(dd) < 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings
        |  FROM l GROUP BY doc_id)
        |SELECT doc.doc_id,
        |  CAST(length(doc.text) AS BIGINT) AS n_samples,
        |  COALESCE(c.n_above, 0) AS n_above,
        |  COALESCE(c.n_below, 0) AS n_below,
        |  COALESCE(c.n_at_mean, 0) AS n_at_mean,
        |  COALESCE(c.n_crossings, 0) AS n_crossings,
        |  CASE WHEN length(doc.text) > 1
        |    THEN (COALESCE(c.n_crossings, 0) * 1000000)
        |      // (length(doc.text) - 1) END AS zcr_ppm
        |FROM documents doc LEFT JOIN c ON doc.doc_id = c.doc_id
        |ORDER BY doc.doc_id""".stripMargin,
    // nine raster-position taps per interior cell (the sobel pattern);
    // foreground test and margins mirror the 9·v − Σ₉ integers
    "mm_pgm_adaptive" -> {
      def px(dx: Int, dy: Int) =
        s"ord(substring(raster, CAST((y + ${dy}) * 8 + x + ${dx} + 1 AS INT), 1))"
      val s9 = (for (dy <- -1 to 1; dx <- -1 to 1) yield px(dx, dy))
        .mkString(" + ")
      s"""WITH g AS (${rasterSql()}),
         |cells AS (
         |  SELECT doc_id,
         |    CAST(i % 8 AS BIGINT) AS x, CAST(i // 8 AS BIGINT) AS y, raster
         |  FROM g, UNNEST(range(0, 8 * h)) AS u(i)
         |  WHERE i % 8 BETWEEN 1 AND 6 AND i // 8 BETWEEN 1 AND h - 2),
         |ex AS (
         |  SELECT doc_id, 9 * ${px(0, 0)} - ($s9) AS excess FROM cells),
         |agg AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_interior,
         |    CAST(sum(CASE WHEN excess > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_above_local,
         |    CAST(sum(CASE WHEN excess > 0 THEN excess ELSE 0 END) AS BIGINT)
         |      AS sum_excess,
         |    CAST(max(excess) AS BIGINT) AS max_excess
         |  FROM ex GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(a.n_interior, 0)::BIGINT AS n_interior,
         |  COALESCE(a.n_above_local, 0)::BIGINT AS n_above_local,
         |  COALESCE(a.sum_excess, 0)::BIGINT AS sum_excess,
         |  a.max_excess
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    // direct conditional sums — the declarative dual of the SAT's
    // corner algebra (a wrong recurrence diverges in values)
    "mm_pgm_integral" ->
      s"""WITH g AS (${rasterSql()}),
         |px AS (
         |  SELECT doc_id, CAST(i % 8 AS BIGINT) AS x,
         |    CAST(i // 8 AS BIGINT) AS y, h,
         |    CAST(ord(substring(raster, CAST(i + 1 AS INT), 1)) AS BIGINT) AS v
         |  FROM g, UNNEST(range(0, 8 * h)) AS u(i))
         |SELECT doc_id,
         |  CAST(sum(v) AS BIGINT) AS total,
         |  CAST(sum(CASE WHEN x < 4 AND y < h // 2 THEN v ELSE 0 END)
         |    AS BIGINT) AS q_tl,
         |  CAST(sum(CASE WHEN x >= 4 AND y < h // 2 THEN v ELSE 0 END)
         |    AS BIGINT) AS q_tr,
         |  CAST(sum(CASE WHEN x < 4 AND y >= h // 2 THEN v ELSE 0 END)
         |    AS BIGINT) AS q_bl,
         |  CAST(sum(CASE WHEN x >= 4 AND y >= h // 2 THEN v ELSE 0 END)
         |    AS BIGINT) AS q_br
         |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // per-(doc, lag) self-join on sample index; argmax ties to the
    // smallest lag; sign-explicit HUGEINT-routed normalized peak
    "mm_wav_pitch" ->
      """WITH v AS (
        |  SELECT doc_id, i,
        |    CAST((ord(substring(text, CAST(i + 1 AS INT), 1)) - 128) * 256
        |      AS BIGINT) AS s
        |  FROM documents, UNNEST(range(0, length(text))) AS u(i)),
        |e AS (
        |  SELECT doc_id, CAST(sum(s * s) AS BIGINT) AS r0
        |  FROM v GROUP BY doc_id),
        |lags AS (SELECT CAST(l AS INT) AS lag FROM UNNEST(range(2, 14)) AS t(l)),
        |rj AS (
        |  SELECT a.doc_id, l.lag, CAST(sum(a.s * b.s) AS BIGINT) AS r
        |  FROM v a CROSS JOIN lags l
        |  JOIN v b ON b.doc_id = a.doc_id AND b.i = a.i + l.lag
        |  GROUP BY a.doc_id, l.lag),
        |rl AS (
        |  SELECT d.doc_id, l.lag, COALESCE(rj.r, 0) AS r
        |  FROM documents d CROSS JOIN lags l
        |  LEFT JOIN rj ON rj.doc_id = d.doc_id AND rj.lag = l.lag),
        |best AS (
        |  SELECT doc_id, lag, r,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY r DESC, lag ASC) AS rk
        |  FROM rl)
        |SELECT b.doc_id, b.lag AS best_lag,
        |  COALESCE(e.r0, 0) AS r0, b.r AS r_lag,
        |  CASE WHEN COALESCE(e.r0, 0) = 0 THEN NULL
        |    WHEN b.r >= 0
        |      THEN CAST((CAST(b.r AS HUGEINT) * 1000000) // e.r0 AS BIGINT)
        |    ELSE -CAST((CAST(-b.r AS HUGEINT) * 1000000) // e.r0 AS BIGINT)
        |  END AS r_ppm
        |FROM best b LEFT JOIN e ON b.doc_id = e.doc_id
        |WHERE b.rk = 1
        |ORDER BY b.doc_id""".stripMargin,
    // The WAV widening is (ord − 128)·256 per char (all-ASCII corpus ⇒
    // char position = byte position = sample position), so every audio
    // feature is re-derivable in SQL; rms/silence divisions round at
    // 4dp on both engines from identical exact integers.
    "mm_audio_wav" ->
      """WITH v AS (
        |  SELECT doc_id, i,
        |    (ord(substring(text, CAST(i + 1 AS INT), 1)) - 128) * 256 AS s
        |  FROM documents, UNNEST(range(0, length(text))) AS u(i)),
        |lagged AS (
        |  SELECT doc_id, i, s,
        |    lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM v),
        |d AS (
        |  SELECT doc_id,
        |    max(abs(s)) AS peak,
        |    sum(CAST(s AS BIGINT) * s) AS energy,
        |    sum(CASE WHEN abs(s) < 16384 THEN 1 ELSE 0 END) AS n_silent,
        |    sum(CASE WHEN i > 0 AND abs(s - prev) >= 4096 THEN 1 ELSE 0 END) AS onsets
        |  FROM lagged GROUP BY doc_id)
        |SELECT doc.doc_id,
        |  CAST(length(doc.text) AS INT) AS n_samples,
        |  CAST(length(doc.text) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST(COALESCE(d.peak, 0) AS INT) AS peak_abs,
        |  CAST(COALESCE(d.energy, 0) AS BIGINT) AS energy,
        |  CAST(COALESCE(d.onsets, 0) AS BIGINT) AS n_onsets,
        |  CASE WHEN length(doc.text) > 0
        |    THEN round(sqrt(CAST(d.energy AS DOUBLE) / length(doc.text)), 4)
        |    ELSE 0.0 END AS rms4,
        |  CASE WHEN length(doc.text) > 0
        |    THEN round(CAST(d.n_silent AS DOUBLE) / length(doc.text), 4)
        |    ELSE 0.0 END AS silence_ratio4
        |FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id
        |ORDER BY doc.doc_id""".stripMargin,
    // 2×2 box means re-derived from the padded-text synth formula;
    // the md5 runs over the same comma-joined decimal string the
    // Scala side builds.
    "mm_pgm_resize" ->
      s"""WITH g AS (${rasterSql()}),
         |vals AS (
         |  SELECT doc_id, h // 2 AS h2,
         |    list_transform(range(0, 4 * (h // 2)), j ->
         |      (ord(substring(raster,
         |         CAST((j // 4) * 16 + (j % 4) * 2 + 1 AS INT), 1))
         |       + ord(substring(raster,
         |         CAST((j // 4) * 16 + (j % 4) * 2 + 2 AS INT), 1))
         |       + ord(substring(raster,
         |         CAST((j // 4) * 16 + (j % 4) * 2 + 9 AS INT), 1))
         |       + ord(substring(raster,
         |         CAST((j // 4) * 16 + (j % 4) * 2 + 10 AS INT), 1))) // 4)
         |      AS vs
         |  FROM g)
         |SELECT doc_id, CAST(4 AS INT) AS w_out, CAST(h2 AS BIGINT) AS h_out,
         |  CAST(4 * h2 AS BIGINT) AS n_out,
         |  CAST(COALESCE(list_sum(vs), 0) AS BIGINT) AS sum_out,
         |  md5(array_to_string(list_transform(vs, v -> CAST(v AS VARCHAR)),
         |    ',')) AS resized_md5
         |FROM vals ORDER BY doc_id""".stripMargin,
    // run boundaries as a position list; the encoding string rebuilt
    // from (boundary char, gap) pairs — byte-identical to the Scala walk
    "mm_rle_encode" ->
      s"""WITH g AS (${rasterSql()}),
         |b AS (
         |  SELECT doc_id, raster, CAST(8 * h AS INT) AS len8,
         |    list_concat(list_concat([CAST(1 AS BIGINT)],
         |      [i FOR i IN range(2, CAST(8 * h AS INT) + 1)
         |         IF substring(raster, i, 1) <>
         |            substring(raster, i - 1, 1)]),
         |      [CAST(8 * h + 1 AS BIGINT)]) AS bp
         |  FROM g)
         |SELECT doc_id, CAST(len8 AS BIGINT) AS n_bytes,
         |  CAST(len(bp) - 1 AS BIGINT) AS n_runs,
         |  CAST(list_max([bp[k + 1] - bp[k]
         |    FOR k IN range(1, len(bp))]) AS BIGINT) AS max_run,
         |  md5(array_to_string(
         |    [CAST(ord(substring(raster, bp[k], 1)) AS VARCHAR) || ',' ||
         |       CAST(bp[k + 1] - bp[k] AS VARCHAR)
         |     FOR k IN range(1, len(bp))], ';')) AS rle_md5
         |FROM b ORDER BY doc_id""".stripMargin,
    // Raster width is 8; quadrant membership and sums are pure integer
    // functions of the padded-text synth formula.
    "mm_pgm_tiles" ->
      s"""WITH g AS (${rasterSql()}),
         |px AS (
         |  SELECT doc_id,
         |    CAST(i % 8 AS BIGINT) AS x, CAST(i // 8 AS BIGINT) AS y, h,
         |    ord(substring(raster, CAST(i AS INT) + 1, 1)) AS v
         |  FROM g, UNNEST(range(0, 8 * h)) AS u(i)),
         |q AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN 2 * y < h AND x < 4 THEN v ELSE 0 END) AS BIGINT) AS q_tl,
         |    CAST(sum(CASE WHEN 2 * y < h AND x >= 4 THEN v ELSE 0 END) AS BIGINT) AS q_tr,
         |    CAST(sum(CASE WHEN 2 * y >= h AND x < 4 THEN v ELSE 0 END) AS BIGINT) AS q_bl,
         |    CAST(sum(CASE WHEN 2 * y >= h AND x >= 4 THEN v ELSE 0 END) AS BIGINT) AS q_br
         |  FROM px GROUP BY doc_id)
         |SELECT doc_id, q_tl, q_tr, q_bl, q_br,
         |  CAST(CASE WHEN q_tl >= q_tr AND q_tl >= q_bl AND q_tl >= q_br THEN 0
         |       WHEN q_tr >= q_bl AND q_tr >= q_br THEN 1
         |       WHEN q_bl >= q_br THEN 2 ELSE 3 END AS INT) AS brightest
         |FROM q ORDER BY doc_id""".stripMargin,
    // Squared-domain gain plan: every product in HUGEINT, no sqrt.
    "mm_wav_gain" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    CAST((ord(substring(text, CAST(i + 1 AS INT), 1)) - 128) * 256
        |      AS BIGINT) AS s
        |  FROM documents, UNNEST(range(0, length(text))) AS u(i)),
        |st AS (
        |  SELECT doc_id, count(*)::BIGINT AS n,
        |    CAST(sum(s * s) AS BIGINT) AS sumsq
        |  FROM v GROUP BY 1),
        |g AS (
        |  SELECT doc_id, n, sumsq,
        |    CASE WHEN sumsq = 0 THEN NULL
        |      ELSE CAST((CAST(67108864 AS HUGEINT) * n * 1000000) // sumsq
        |        AS BIGINT) END AS gain2_ppm
        |  FROM st),
        |cl AS (
        |  SELECT v.doc_id,
        |    CAST(sum(CASE WHEN CAST(v.s * v.s AS HUGEINT) *
        |        (CAST(67108864 AS HUGEINT) * st.n) >
        |        CAST(1073676289 AS HUGEINT) * st.sumsq
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_clip
        |  FROM v JOIN st USING (doc_id) GROUP BY 1)
        |SELECT g.doc_id, g.n AS n_samples, g.sumsq, g.gain2_ppm,
        |  CASE WHEN g.sumsq = 0 THEN NULL ELSE cl.n_clip END AS n_clip,
        |  CASE WHEN g.sumsq = 0 THEN NULL ELSE cl.n_clip > 0 END
        |    AS needs_limiter
        |FROM g JOIN cl USING (doc_id) ORDER BY doc_id""".stripMargin,
    // CDF, remap, and variance re-derive from the raster synth in
    // pure integers (≤256-row per-image histograms).
    "mm_pgm_equalize" ->
      s"""WITH g AS (${rasterSql()}),
         |px AS (
         |  SELECT doc_id,
         |    ord(substring(raster, CAST(i + 1 AS INT), 1)) AS p
         |  FROM g, UNNEST(range(0, 8 * h)) AS u(i)),
         |hist AS (
         |  SELECT doc_id, p, CAST(count(*) AS BIGINT) AS c
         |  FROM px GROUP BY 1, 2),
         |cdf AS (
         |  SELECT doc_id, p, c,
         |    CAST(sum(c) OVER (PARTITION BY doc_id ORDER BY p) AS BIGINT)
         |      AS cd,
         |    CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n,
         |    min(p) OVER (PARTITION BY doc_id) AS minp,
         |    max(p) OVER (PARTITION BY doc_id) AS maxp
         |  FROM hist),
         |cm AS (
         |  SELECT doc_id, min(cd) AS cmin FROM cdf GROUP BY 1),
         |nv AS (
         |  SELECT f.doc_id, f.p, f.c, f.cd, f.n, f.minp, f.maxp,
         |    CASE WHEN f.n > m.cmin
         |      THEN ((f.cd - m.cmin) * 255) // (f.n - m.cmin)
         |      ELSE 0 END AS nv
         |  FROM cdf f JOIN cm m USING (doc_id))
         |SELECT doc_id,
         |  CAST(max(n) AS BIGINT) AS n_pixels,
         |  CAST(max(maxp) - max(minp) AS BIGINT) AS range_before,
         |  CAST(max(nv) - min(nv) AS BIGINT) AS range_after,
         |  CAST(max(n) * sum(c * p * p) - sum(c * p) * sum(c * p) AS BIGINT)
         |    AS varn_before,
         |  CAST(max(n) * sum(c * nv * nv) - sum(c * nv) * sum(c * nv)
         |    AS BIGINT) AS varn_after
         |FROM nv GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Each Sobel tap is raster-position arithmetic on the synth
    // formula; magnitude and census stay pure INT.
    "mm_pgm_sobel" -> {
      def px(dx: Int, dy: Int) =
        s"ord(substring(raster, CAST((y + ${dy}) * 8 + x + ${dx} + 1 AS INT), 1))"
      val gx = s"((${px(1, -1)} + 2 * ${px(1, 0)} + ${px(1, 1)}) - " +
        s"(${px(-1, -1)} + 2 * ${px(-1, 0)} + ${px(-1, 1)}))"
      val gy = s"((${px(-1, 1)} + 2 * ${px(0, 1)} + ${px(1, 1)}) - " +
        s"(${px(-1, -1)} + 2 * ${px(0, -1)} + ${px(1, -1)}))"
      s"""WITH g AS (${rasterSql()}),
         |cells AS (
         |  SELECT doc_id, raster,
         |    CAST(i % 8 AS BIGINT) AS x, CAST(i // 8 AS BIGINT) AS y
         |  FROM g, UNNEST(range(0, 8 * h)) AS u(i)
         |  WHERE i % 8 BETWEEN 1 AND 6 AND i // 8 BETWEEN 1 AND h - 2),
         |gr AS (
         |  SELECT doc_id, abs($gx) + abs($gy) AS grad FROM cells),
         |agg AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_interior,
         |    CAST(sum(grad) AS BIGINT) AS grad_sum,
         |    CAST(max(grad) AS BIGINT) AS max_grad,
         |    CAST(sum(CASE WHEN grad >= 128 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_edges
         |  FROM gr GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(a.n_interior, 0)::BIGINT AS n_interior,
         |  COALESCE(a.grad_sum, 0)::BIGINT AS grad_sum,
         |  COALESCE(a.max_grad, 0)::BIGINT AS max_grad,
         |  COALESCE(a.n_edges, 0)::BIGINT AS n_edges
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    // Island trick: a silent run's id is position − rank-among-silent,
    // constant exactly along each maximal run.
    "mm_silence_spans" ->
      s"""WITH v AS (
         |  SELECT doc_id, i,
         |    CASE WHEN abs((ord(substring(text, CAST(i + 1 AS INT), 1)) - 128) * 256)
         |              < 16384 THEN 1 ELSE 0 END AS silent
         |  FROM documents, UNNEST(range(0, length(text))) AS u(i)),
         |isl AS (
         |  SELECT doc_id,
         |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
         |  FROM v WHERE silent = 1),
         |runs AS (
         |  SELECT doc_id, count(*)::BIGINT AS run_len
         |  FROM isl GROUP BY doc_id, grp),
         |agg AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_spans,
         |    CAST(max(run_len) AS BIGINT) AS max_span,
         |    CAST(sum(run_len) AS BIGINT) AS silent_in_spans
         |  FROM runs WHERE run_len >= $MinSilenceSpan GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(a.n_spans, 0)::BIGINT AS n_spans,
         |  COALESCE(a.max_span, 0)::BIGINT AS max_span,
         |  COALESCE(a.silent_in_spans, 0)::BIGINT AS silent_in_spans
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // interior 4-neighborhood test by raster-position arithmetic
    "mm_pgm_erode" ->
      s"""WITH g AS (${rasterSql()}),
         |px AS (
         |  SELECT doc_id, i,
         |    CAST(i % 8 AS BIGINT) AS x, CAST(i // 8 AS BIGINT) AS y, h,
         |    CASE WHEN ord(substring(raster, CAST(i + 1 AS INT), 1)) >= 115
         |         THEN 1 ELSE 0 END AS b,
         |    CASE WHEN i % 8 > 0 AND ord(substring(raster,
         |           CAST(i AS INT), 1)) >= 115 THEN 1 ELSE 0 END AS bl,
         |    CASE WHEN i % 8 < 7 AND ord(substring(raster,
         |           CAST(i + 2 AS INT), 1)) >= 115 THEN 1 ELSE 0 END AS br,
         |    CASE WHEN i >= 8 AND ord(substring(raster,
         |           CAST(i - 7 AS INT), 1)) >= 115 THEN 1 ELSE 0 END AS bu,
         |    CASE WHEN i < 8 * (h - 1) AND ord(substring(raster,
         |           CAST(i + 9 AS INT), 1)) >= 115 THEN 1 ELSE 0 END AS bd
         |  FROM g, UNNEST(range(0, 8 * h)) AS u(i))
         |SELECT doc_id,
         |  CAST(sum(b) AS BIGINT) AS n_bright,
         |  CAST(sum(CASE WHEN b = 1 AND x > 0 AND x < 7
         |      AND y > 0 AND y < h - 1
         |      AND bl = 1 AND br = 1 AND bu = 1 AND bd = 1
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
         |  CAST(sum(b) - sum(CASE WHEN b = 1 AND x > 0 AND x < 7
         |      AND y > 0 AND y < h - 1
         |      AND bl = 1 AND br = 1 AND bu = 1 AND bd = 1
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_peeled
         |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // histogram → cumulative (w0, s0) per present gray value →
    // micro-score argmax; HUGEINT mirrors the Spark BigInt routing
    "mm_pgm_otsu" ->
      s"""WITH g AS (${rasterSql()}),
         |pxv AS (
         |  SELECT doc_id, ord(substring(raster, CAST(i + 1 AS INT), 1)) AS v
         |  FROM g, UNNEST(range(0, 8 * h)) AS u(i)),
         |hist AS (
         |  SELECT doc_id, v, count(*)::BIGINT AS c
         |  FROM pxv GROUP BY doc_id, v),
         |tot AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         |    CAST(sum(v * c) AS BIGINT) AS s
         |  FROM hist GROUP BY doc_id),
         |cum AS (
         |  SELECT doc_id, v,
         |    CAST(sum(c) OVER (PARTITION BY doc_id ORDER BY v) AS BIGINT)
         |      AS w0,
         |    CAST(sum(v * c) OVER (PARTITION BY doc_id ORDER BY v) AS BIGINT)
         |      AS s0
         |  FROM hist),
         |numc AS (
         |  SELECT c.doc_id, c.v AS t, c.w0, t2.n - c.w0 AS w1, t2.n AS n,
         |    CAST(c.s0 AS HUGEINT) * t2.n - CAST(t2.s AS HUGEINT) * c.w0 AS num
         |  FROM cum c JOIN tot t2 USING (doc_id)
         |  WHERE c.w0 > 0 AND c.w0 < t2.n AND c.v <= 254),
         |cand AS (
         |  SELECT doc_id, t, w0, w1,
         |    CAST((num * num * CAST(1000000 AS HUGEINT))
         |      // (CAST(w0 AS HUGEINT) * w1 * n * n) AS BIGINT) AS sb2_micro
         |  FROM numc),
         |best AS (
         |  SELECT doc_id, t, w0, w1, sb2_micro,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY sb2_micro DESC, t ASC) AS rk
         |  FROM cand)
         |SELECT d.doc_id, CAST(b.t AS INT) AS otsu_t,
         |  b.w0 AS n_below, b.w1 AS n_above, b.sb2_micro
         |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rk = 1) b
         |  ON d.doc_id = b.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // the dd_clusters recursive min-label CTE, per image: self-loop +
    // 4-neighbor edges over threshold-115 pixels, min label to a fixed
    // point, census + min-pid checksum per blob
    "mm_pgm_blobs" ->
      s"""WITH RECURSIVE g AS (${rasterSql()}),
         |px AS (
         |  SELECT doc_id, CAST(i % 8 AS BIGINT) AS x,
         |    CAST(i // 8 AS BIGINT) AS y, i AS pid
         |  FROM g, UNNEST(range(0, 8 * h)) AS u(i)
         |  WHERE ord(substring(raster, CAST(i + 1 AS INT), 1)) >= 115),
         |adj AS (
         |  SELECT a.doc_id, a.pid AS src, b.pid AS dst
         |  FROM px a JOIN px b
         |    ON a.doc_id = b.doc_id AND b.pid = a.pid + 1 AND a.x < 7
         |  UNION ALL
         |  SELECT a.doc_id, a.pid, b.pid
         |  FROM px a JOIN px b
         |    ON a.doc_id = b.doc_id AND b.pid = a.pid + 8),
         |e AS (
         |  SELECT doc_id, src, dst FROM adj
         |  UNION ALL SELECT doc_id, dst, src FROM adj
         |  UNION ALL SELECT doc_id, pid, pid FROM px),
         |lbl AS (
         |  SELECT doc_id, src AS pid, min(dst) AS l FROM e GROUP BY 1, 2
         |  UNION
         |  SELECT e.doc_id, e.src, min(lbl.l)
         |  FROM e JOIN lbl ON e.doc_id = lbl.doc_id AND e.dst = lbl.pid
         |  GROUP BY 1, 2),
         |fin AS (SELECT doc_id, pid, min(l) AS l FROM lbl GROUP BY 1, 2),
         |blobs AS (
         |  SELECT doc_id, l, count(*)::BIGINT AS sz
         |  FROM fin GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id, CAST(sum(sz) AS BIGINT) AS n_bright,
         |    count(*)::BIGINT AS n_blobs,
         |    CAST(max(sz) AS BIGINT) AS max_blob,
         |    CAST(sum(l) AS BIGINT) AS label_sum
         |  FROM blobs GROUP BY 1)
         |SELECT d.doc_id, COALESCE(a.n_bright, 0) AS n_bright,
         |  COALESCE(a.n_blobs, 0) AS n_blobs,
         |  COALESCE(a.max_blob, 0) AS max_blob,
         |  COALESCE(a.label_sum, 0) AS label_sum
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // Sylvester signs re-derived per (k, j): (−1)^popcount(k AND j),
    // popcount spelled with shifts so no engine-specific bit builtin
    // sits in the contract; Parseval recomputed from the same blocks
    "mm_wav_wht" ->
      """WITH v AS (
        |  SELECT doc_id, i // 8 AS blk, i % 8 AS j,
        |    CAST((ord(substring(text, CAST(i + 1 AS INT), 1)) - 128) * 256
        |      AS BIGINT) AS s
        |  FROM documents, UNNEST(range(0, (length(text) // 8) * 8)) AS u(i)),
        |c AS (
        |  SELECT doc_id, blk, kk.k,
        |    sum(CASE WHEN ((kk.k & v.j) & 1) + (((kk.k & v.j) >> 1) & 1)
        |               + (((kk.k & v.j) >> 2) & 1) = 1
        |             OR ((kk.k & v.j) & 1) + (((kk.k & v.j) >> 1) & 1)
        |               + (((kk.k & v.j) >> 2) & 1) = 3
        |        THEN -v.s ELSE v.s END) AS ck
        |  FROM v, UNNEST(range(0, 8)) AS kk(k)
        |  GROUP BY 1, 2, 3),
        |e AS (
        |  SELECT doc_id,
        |    CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks,
        |    CAST(sum(CASE WHEN k = 0 THEN ck * ck ELSE 0 END) AS BIGINT) AS e0,
        |    CAST(sum(CASE WHEN k = 1 THEN ck * ck ELSE 0 END) AS BIGINT) AS e1,
        |    CAST(sum(CASE WHEN k = 2 THEN ck * ck ELSE 0 END) AS BIGINT) AS e2,
        |    CAST(sum(CASE WHEN k = 3 THEN ck * ck ELSE 0 END) AS BIGINT) AS e3,
        |    CAST(sum(CASE WHEN k = 4 THEN ck * ck ELSE 0 END) AS BIGINT) AS e4,
        |    CAST(sum(CASE WHEN k = 5 THEN ck * ck ELSE 0 END) AS BIGINT) AS e5,
        |    CAST(sum(CASE WHEN k = 6 THEN ck * ck ELSE 0 END) AS BIGINT) AS e6,
        |    CAST(sum(CASE WHEN k = 7 THEN ck * ck ELSE 0 END) AS BIGINT) AS e7
        |  FROM c GROUP BY doc_id),
        |tot AS (
        |  SELECT doc_id, CAST(sum(s * s) AS BIGINT) AS t8 FROM v
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(e.n_blocks, 0) AS n_blocks,
        |  COALESCE(e.e0, 0) AS e0, COALESCE(e.e1, 0) AS e1,
        |  COALESCE(e.e2, 0) AS e2, COALESCE(e.e3, 0) AS e3,
        |  COALESCE(e.e4, 0) AS e4, COALESCE(e.e5, 0) AS e5,
        |  COALESCE(e.e6, 0) AS e6, COALESCE(e.e7, 0) AS e7,
        |  CASE WHEN COALESCE(e.e0, 0) + COALESCE(e.e1, 0)
        |      + COALESCE(e.e2, 0) + COALESCE(e.e3, 0) + COALESCE(e.e4, 0)
        |      + COALESCE(e.e5, 0) + COALESCE(e.e6, 0) + COALESCE(e.e7, 0)
        |    = 8 * COALESCE(t.t8, 0) THEN CAST(1 AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS parseval_ok
        |FROM documents d
        |LEFT JOIN e ON d.doc_id = e.doc_id
        |LEFT JOIN tot t ON d.doc_id = t.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "mm_audio_frames" ->
      """WITH v AS (
        |  SELECT doc_id, CAST(i // 160 AS BIGINT) AS f,
        |    CAST((ord(substring(text, CAST(i + 1 AS INT), 1)) - 128) * 256 AS BIGINT) AS s
        |  FROM documents, UNNEST(range(0, length(text))) AS u(i)),
        |fr AS (
        |  SELECT doc_id, f, count(*) AS covered, sum(s * s) AS e
        |  FROM v GROUP BY doc_id, f),
        |d AS (
        |  SELECT doc_id, count(*) AS total_frames,
        |    sum(CASE WHEN e >= covered * 150994944 THEN 1 ELSE 0 END) AS voiced,
        |    max(e) AS maxe
        |  FROM fr GROUP BY doc_id)
        |SELECT doc.doc_id,
        |  CAST(COALESCE(d.total_frames, 0) AS BIGINT) AS total_frames,
        |  CAST(COALESCE(d.voiced, 0) AS BIGINT) AS voiced_frames,
        |  CAST(COALESCE(d.maxe, 0) AS BIGINT) AS max_frame_energy
        |FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id
        |ORDER BY doc.doc_id""".stripMargin,
    "mm_frames" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_bytes,
        |  CAST((length(text) + 15) // 16 AS BIGINT) AS n_frames,
        |  md5(array_to_string(
        |    list_transform(range(0, (length(text) + 15) // 16),
        |                   i -> substring(text, CAST(i * 16 + 1 AS INT), 1)),
        |    '')) AS frames_checksum
        |FROM documents ORDER BY doc_id""".stripMargin
  )

  /** Assembled at ACCESS time: mm_decode_jpeg's oracle reads the
    * landing-time sidecar parquet THIS process pinned ([[jpegSidecar]]
    * — graft.Verify runs every query, which sets it, before dumping
    * oracle_sql.json), joined against arithmetic dims from the
    * documents table. DuckDB's `read_parquet` takes the absolute
    * path; everything else stays on the bare table views.
    */
  def oracleSql: Map[String, String] = staticOracleSql + ("mm_decode_jpeg" ->
    s"""WITH sc AS (SELECT * FROM read_parquet('${jpegSidecar.get()}/*.parquet')),
       |sub AS (SELECT doc_id, greatest(1, (length(text) + 7) // 8) AS h
       |        FROM documents WHERE $PngSubsetPredSql)
       |SELECT d.doc_id, sc.n_jpeg_bytes, CAST(8 AS INT) AS width,
       |  CAST(d.h AS INT) AS height, sc.sum_abs_err, sc.max_abs_err,
       |  sc.pixels_md5
       |FROM sub d JOIN sc ON sc.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin) + ("mm_png_chunks" -> {
    // fully independent re-walk of the SAME landing files: read_blob
    // + a recursive CTE over the hex string (DuckDB's blob type has
    // no byte slicing; hex + positional nibble decode does — big-
    // endian u32 at byte offset o = Σ nibble(2o+i)·16^(7−i))
    def be32(off: String): String = (0 until 8).map { i =>
      s"(strpos('0123456789ABCDEF', substring(hx, ($off) * 2 + ${i + 1}, 1)) - 1)::BIGINT * ${1L << (4 * (7 - i))}"
    }.mkString("(", " + ", ")")
    s"""WITH RECURSIVE f AS (
       |  SELECT CAST(regexp_extract(filename, '(\\d+)\\.png$$', 1) AS BIGINT)
       |      AS doc_id,
       |    hex(content) AS hx, size AS n_bytes
       |  FROM read_blob('${pngChunkLanding.get()}/shard=*/*.png')),
       |walk AS (
       |  SELECT doc_id, hx, n_bytes, CAST(8 AS BIGINT) AS off,
       |    CAST(0 AS BIGINT) AS n_chunks, CAST(0 AS BIGINT) AS n_idat,
       |    CAST(0 AS BIGINT) AS idat_bytes, CAST(0 AS BIGINT) AS w,
       |    CAST(0 AS BIGINT) AS h, FALSE AS done
       |  FROM f
       |  UNION ALL
       |  SELECT doc_id, hx, n_bytes, off + 12 + len,
       |    n_chunks + 1,
       |    n_idat + CASE WHEN typ = '49444154' THEN 1 ELSE 0 END,
       |    idat_bytes + CASE WHEN typ = '49444154' THEN len ELSE 0 END,
       |    CASE WHEN typ = '49484452' THEN ${be32("off + 8")} ELSE w END,
       |    CASE WHEN typ = '49484452' THEN ${be32("off + 12")} ELSE h END,
       |    typ = '49454E44'
       |  FROM (
       |    SELECT *, ${be32("off")} AS len,
       |      substring(hx, (off + 4) * 2 + 1, 8) AS typ
       |    FROM walk WHERE NOT done) t)
       |SELECT doc_id, n_bytes, n_chunks, n_idat, idat_bytes,
       |  w AS width, h AS height
       |FROM walk WHERE done ORDER BY doc_id""".stripMargin
  })
}
