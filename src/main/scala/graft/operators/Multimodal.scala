package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media treated as opaque `binary`
  * payloads with typed metadata, plus a decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub ([[fakeDecode]]) — but the
  * Spark-side plumbing is real: binary columns, schema, partition-wise
  * batch processing (`mapPartitions`, the Scala analog of a Pandas-UDF
  * batch), and a typed `Dataset` feature output. Swapping
  * [[fakeDecode]] for a real codec changes no plan shape.
  *
  * Scale: both queries are narrow per-row/per-partition transforms — no
  * shuffle at all until the final presentation sort, which at 100 TB
  * would be dropped (sinks don't need order).
  */
object Multimodal {

  /** Deterministic stand-in for a media decoder: 16-dim byte-value
    * histogram of the payload, L1-normalized. STUB — replace with a
    * real decoder where codecs exist.
    */
  def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) % 16) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Deterministic stand-in for a resize: nearest-neighbor
    * down/up-sample of the byte payload to `n` bytes. STUB — the real
    * pipeline would resize decoded frames, not raw bytes; the partition
    * shape and signature are what carry over.
    */
  def fakeResize(payload: Array[Byte], n: Int): Array[Byte] = {
    if (payload.isEmpty) new Array[Byte](n)
    else Array.tabulate(n)(i => payload((i.toLong * payload.length / n).toInt))
  }

  /** Deterministic stand-in for frame sampling: every `stride`-th byte
    * starting at `offset`. STUB for keyframe extraction.
    */
  def sampleFrames(payload: Array[Byte], stride: Int, offset: Int = 0): Array[Byte] =
    Iterator.from(offset, stride).takeWhile(_ < payload.length).map(payload).toArray

  final case class MediaFeature(
      doc_id: Long,
      n_bytes: Int,
      features: Array[Float],
      resized: Array[Byte],
      frame_sample: Array[Byte])

  /** Typed partition-batched decode → resize → frame-sample →
    * feature-extract pipeline over binary payloads (the Scala analog of
    * a Pandas-UDF batch stage; swap the fake* stubs for real codecs and
    * nothing about schema/partitioning/batching changes).
    */
  def extractFeatures(s: SparkSession, dir: String): Dataset[MediaFeature] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val resized = fakeResize(payload, 64)
        MediaFeature(id, payload.length, fakeDecode(resized),
          resized, sampleFrames(payload, stride = 16))
      })
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Metadata over opaque binary payloads: byte length, checksum,
    // stub-decoded "dimensions", frame count, first-frame sample hash.
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

    // Feature extraction through the typed mapPartitions path; the
    // aggregate projection keeps the output oracle-exempt but
    // deterministic (row count + exact integer sums).
    "mm_features" -> ((s, dir) => {
      extractFeatures(s, dir).toDF()
        .select(col("doc_id"), col("n_bytes"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("features"), 16).cast("double"), 4).as("f15"))
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

  val oracleSql: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
        |  CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height,
        |  CAST(1 + octet_length(encode(text)) // 64 AS INT) AS n_frames,
        |  md5(substring(text, 1, 32)) AS frame0_checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The decode stub IS SQL-expressible on this corpus (all-ASCII, so
    // character position == byte position — asserted by the n_bytes
    // column, which would diverge otherwise): re-derive the 64-byte
    // nearest-neighbor resize via substring indexing, then the 16-bin
    // histogram bins for positions 0 and 15. k/64 is dyadic, so the
    // float→double widening and the 4dp round agree bit-exactly.
    "mm_features" ->
      """WITH bytes AS (
        |  SELECT doc_id, length(text) AS n_bytes,
        |    ord(substring(text, CAST(i * length(text) // 64 AS INT) + 1, 1)) % 16 AS bin
        |  FROM documents, UNNEST(range(0, 64)) AS u(i))
        |SELECT doc_id, CAST(max(n_bytes) AS INT) AS n_bytes,
        |  round(sum(CASE WHEN bin = 0 THEN 1 ELSE 0 END) / 64.0, 4) AS f0,
        |  round(sum(CASE WHEN bin = 15 THEN 1 ELSE 0 END) / 64.0, 4) AS f15
        |FROM bytes GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_bytes,
        |  CAST((length(text) + 15) // 16 AS BIGINT) AS n_frames,
        |  md5(array_to_string(
        |    list_transform(range(0, (length(text) + 15) // 16),
        |                   i -> substring(text, CAST(i * 16 + 1 AS INT), 1)),
        |    '')) AS frames_checksum
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
