package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's chunked line-file input
  * (O1 `Worker.cc:123-141`) with its locality config (O14
  * `Scheduler.cc:86-100`) — the reference's source contract as a
  * first-class Spark connector instead of an RDD helper:
  *
  * {{{
  * spark.read.format("graftlines")
  *   .option("chunkSize", 64)          // lines per chunk (input split)
  *   .option("maxChunks", 4)           // W3 bounded read (optional)
  *   .option("localityFile", cfgPath)  // "<chunk> <node>" lines (optional)
  *   .option("numWorkers", 4)          // node-id wrap rule (O14)
  *   .load(path)                       // → (line_no BIGINT 1-based, text STRING)
  * }}}
  *
  * Planning indexes chunk byte-boundaries in ONE driver pass (the
  * line-count contract requires a sequential line index; the reference
  * pays the same cost in EVERY worker, which re-reads and skips
  * `(k-1)·chunk_size` lines, `Worker.cc:128-131`). Each task then reads
  * only its byte range. Chunk ids are 1-based (W5); each chunk's
  * `preferredLocations` carries its configured node's host, which
  * Spark's delay scheduling consumes — the O9 dispatch policy with no
  * scheduler code. For volumes where a driver line-index is impractical
  * the byte-split `spark.read.text` path ([[LineFile]]) remains the
  * scale route; this connector is the reference-exact contract.
  */
class LineFileV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftlines"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LineFileV2.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LineFileV2.LineTable(new CaseInsensitiveStringMap(properties))
}

object LineFileV2 {

  val schema: StructType = StructType(Seq(
    StructField("line_no", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  /** One chunk = one input split; `hosts` feeds delay scheduling. */
  case class LineChunk(
      chunkId: Int, start: Long, end: Long, firstLine: Long,
      hosts: Array[String]) extends InputPartition {
    override def preferredLocations(): Array[String] = hosts
  }

  /** Driver-side chunk planning: one sequential pass recording the byte
    * offset every `chunkSize` newlines. A trailing final line without a
    * newline counts (getline semantics, same as `spark.read.text`);
    * `maxChunks` stops planning — and therefore reading — at the W3
    * bound.
    */
  def planChunks(
      path: String, chunkSize: Int, maxChunks: Option[Int],
      chunkHosts: Map[Int, String]): Seq[LineChunk] = {
    require(chunkSize > 0, "chunkSize must be positive")
    val in = new java.io.BufferedInputStream(
      new java.io.FileInputStream(path), 1 << 16)
    try {
      val chunks = ArrayBuffer[LineChunk]()
      def hostsOf(id: Int): Array[String] = chunkHosts.get(id).toArray
      var offset = 0L
      var chunkStart = 0L
      var firstLineOfChunk = 1L
      var linesInChunk = 0
      var totalLines = 0L
      var capped = false
      var b = in.read()
      while (b >= 0 && !capped) {
        if (b == '\n') {
          totalLines += 1
          linesInChunk += 1
          if (linesInChunk == chunkSize) {
            val id = chunks.length + 1 // 1-based (W5)
            chunks += LineChunk(id, chunkStart, offset + 1, firstLineOfChunk, hostsOf(id))
            chunkStart = offset + 1
            firstLineOfChunk = totalLines + 1
            linesInChunk = 0
            capped = maxChunks.exists(chunks.length >= _)
          }
        }
        offset += 1
        b = in.read()
      }
      // drain remaining bytes only to learn the file length when capped
      if (capped) () // bounded read: trailing lines do not participate
      else if (offset > chunkStart) {
        // partial final chunk (short line count and/or no trailing \n)
        val id = chunks.length + 1
        chunks += LineChunk(id, chunkStart, offset, firstLineOfChunk, hostsOf(id))
      }
      chunks.toSeq
    } finally in.close()
  }

  /** chunk → "worker-<node>" from the O14 config with the wrap rule. */
  def hostsFromConfig(localityFile: String, numWorkers: Int): Map[Int, String] =
    LocalityFile.parse(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(localityFile)).asScala,
      numWorkers)
      .map { case (chunk, node) => chunk -> s"worker-$node" }.toMap

  class LineTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
    override def name(): String = s"graftlines(${options.get("path")})"
    override def schema(): StructType = LineFileV2.schema
    override def capabilities(): util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ).asJava
    override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
      new LineScanBuilder(opts)
  }

  /** Filter pushdown: an upper bound on `line_no` prunes chunk PLANNING
    * — `line_no <= N` needs only the first ⌈N / chunkSize⌉ chunks, so
    * the W3 bound falls out of the query's own predicate. Chunk
    * granularity over-reads up to one chunk, so every filter is also
    * kept as a residual for Spark to re-apply — pushdown here is pure
    * partition pruning, never a correctness dependency.
    */
  class LineScanBuilder(opts: CaseInsensitiveStringMap)
      extends ScanBuilder with SupportsPushDownFilters
      with SupportsPushDownRequiredColumns {
    private var bound: Option[Long] = None
    private var pushed: Array[Filter] = Array.empty
    private var required: StructType = LineFileV2.schema

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val usable = filters.collect {
        case f @ LessThanOrEqual("line_no", v: Number) => (f, v.longValue())
        case f @ LessThan("line_no", v: Number) => (f, v.longValue() - 1)
      }
      if (usable.nonEmpty) {
        val n = usable.map(_._2).min
        bound = Some(bound.fold(n)(math.min(_, n)))
        pushed = usable.map(_._1)
      }
      filters // all residual: chunk granularity over-reads
    }
    override def pushedFilters(): Array[Filter] = pushed
    // Column pruning: a text-only projection (the wordcount shape)
    // skips materializing line numbers per row.
    override def pruneColumns(requiredSchema: StructType): Unit =
      if (requiredSchema.fields.nonEmpty) required = requiredSchema
    override def build(): Scan = new LineScan(opts, bound, required)
  }

  class LineScan(
      options: CaseInsensitiveStringMap,
      lineBound: Option[Long] = None,
      required: StructType = LineFileV2.schema)
      extends Scan with Batch {
    private val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graftlines: 'path' is required"))
    private val chunkSize = options.getInt("chunkSize", 64)
    private val maxChunks = {
      val explicit = Option(options.get("maxChunks")).map(_.toInt)
      val fromBound = lineBound.map(n =>
        math.max(0L, (n + chunkSize - 1) / chunkSize).toInt)
      (explicit ++ fromBound).reduceOption(math.min)
    }
    private val hosts =
      Option(options.get("localityFile"))
        .map(f => hostsFromConfig(f, options.getInt("numWorkers", 4)))
        .getOrElse(Map.empty[Int, String])

    override def readSchema(): StructType = required
    override def description(): String =
      s"graftlines $path chunkSize=$chunkSize maxChunks=$maxChunks lineBound=$lineBound"
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      planChunks(path, chunkSize, maxChunks, hosts).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      LineReaderFactory(path, required.fieldNames)
  }

  case class LineReaderFactory(path: String, fields: Array[String])
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val c = partition.asInstanceOf[LineChunk]
      new PartitionReader[InternalRow] {
        // one bounded byte-range read per task
        private val bytes: Array[Byte] = {
          val in = new java.io.RandomAccessFile(path, "r")
          try {
            in.seek(c.start)
            val buf = new Array[Byte]((c.end - c.start).toInt)
            in.readFully(buf)
            buf
          } finally in.close()
        }
        private var pos = 0
        private var lineNo = c.firstLine - 1
        private var current: InternalRow = _

        override def next(): Boolean = {
          if (pos >= bytes.length) return false
          var e = pos
          while (e < bytes.length && bytes(e) != '\n') e += 1
          lineNo += 1
          // emit values in the PRUNED schema's field order
          val values: Array[Any] = fields.map {
            case "line_no" => lineNo: Any
            case "text" => UTF8String.fromBytes(bytes, pos, e - pos): Any
          }
          current = new GenericInternalRow(values)
          pos = e + 1 // skip the newline; a final line without one ends the loop
          true
        }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
  }
}
