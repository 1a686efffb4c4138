package graft.sources.wire

import java.io.{DataInputStream, EOFException}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source for the graft wire format (SURVEY §2 A33).
  *
  * The reference consumes framed event bytes off a wire (Yellowstone gRPC
  * / ShredStream connections, each connection an independent byte
  * sequence — `src/grpc/`, `src/shred/`). The Spark-native re-expression
  * is a DSv2 table: a directory of frame files, each file a concatenation
  * of `[u32 LE length][payload]` frames, surfaced as rows
  * `(file, frame_idx, payload)` ready for the columnar decoders
  * ([[graft.sources.EventCodec]] / [[graft.sources.ProtocolRegistry]]).
  *
  * Scale design: one [[InputPartition]] per frame file — files are the
  * unit of parallelism exactly as connections are in the reference; a
  * 1000-executor cluster reading a day of capture spreads files across
  * executors with no coordination, and `estimateStatistics` reports the
  * real byte size so Catalyst/AQE can cost joins against wire tables.
  * Variable-length frames make BLIND byte-range splits unsafe (a split
  * could land mid-frame), so a pathological single large file is split
  * at EXACT frame boundaries instead: files larger than the
  * `split.bytes` read option (default 128 MB, the
  * `files.maxPartitionBytes` analog) get a planning-time header walk —
  * header-only IO, `seek` past every payload, only for oversized files
  * — that emits one partition per ~`split.bytes` of frames, each with
  * its exact (startOffset, startFrameIdx, endOffset). The normal
  * rotated-capture layout pays zero planning overhead; the walk is the
  * escape hatch, not the primary path (capture should rotate files).
  * Column pruning is pushed into the reader: a `count(*)` or
  * metadata-only query skips payload materialization per frame.
  */
class GraftWireSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-wire"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftWireTable.Schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftWireTable(properties.get("path"))
}

object GraftWireTable {
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Default frame-boundary split target for oversized files — the
    * `spark.sql.files.maxPartitionBytes` analog. */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  /** Partition plan for one frame file. Files at or under `splitBytes`
    * are one partition with no IO at all (the rotated-capture fast
    * path). An oversized file gets a header walk: read each 4-byte
    * length, `seek` past the payload — so planning IO is headers only —
    * and cut a partition at the first frame boundary past every
    * `splitBytes` of accumulated frames. Cuts carry the exact byte
    * offset AND frame index, so split readers produce bit-identical
    * (file, frame_idx, payload) rows to the unsplit reader. A truncated
    * tail header/payload ends the walk early exactly as the reader
    * stops early — split planning never makes corrupt data fatal. */
  def planFile(file: String, splitBytes: Long): Seq[GraftWirePartition] = {
    val p = new Path(file)
    val fs = p.getFileSystem(new Configuration())
    val total = fs.getFileStatus(p).getLen
    if (total <= splitBytes)
      return Seq(GraftWirePartition(file, 0L, 0L, Long.MaxValue))
    val in = fs.open(p)
    try {
      val hdr = new Array[Byte](4)
      val cuts = scala.collection.mutable.ArrayBuffer[(Long, Long)]((0L, 0L))
      var pos = 0L
      var idx = 0L
      var nextCut = splitBytes
      var halted = false
      while (!halted && pos + 4 <= total) {
        in.seek(pos)
        in.readFully(hdr)
        val len = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) |
          ((hdr(2) & 0xff) << 16) | ((hdr(3) & 0xff) << 24)
        val end = pos + 4 + len.toLong
        if (len < 0 || end > total) halted = true // truncated/corrupt tail
        else {
          if (pos >= nextCut) {
            cuts += ((pos, idx))
            nextCut = pos + splitBytes
          }
          pos = end
          idx += 1
        }
      }
      cuts.zipAll(cuts.drop(1).map(c => Some(c)), (0L, 0L), None).map {
        case ((off, fidx), Some((endOff, _))) =>
          GraftWirePartition(file, off, fidx, endOff)
        case ((off, fidx), None) =>
          GraftWirePartition(file, off, fidx, Long.MaxValue)
      }.toSeq
    } finally in.close()
  }

  /** Frame files under `path` — a directory, a single file, or a glob
    * (e.g. `out/batch_*`, the per-micro-batch egress layout). */
  def listFrameFiles(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val roots: Seq[Path] =
      if (path.exists(c => "*?[{".contains(c)))
        Option(fs.globStatus(p)).map(_.toSeq.map(_.getPath))
          .getOrElse(Seq.empty)
      else Seq(p)
    roots.flatMap { r =>
      if (fs.getFileStatus(r).isDirectory)
        fs.listStatus(r).filter(_.isFile).map(_.getPath.toString)
          .filter(_.endsWith(".bin")).toSeq
      else Seq(r.toString)
    }.sorted
  }
}

class GraftWireTable(path: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "graft-wire requires .load(path)")
  override def name(): String = s"graft-wire:$path"
  override def schema(): StructType = GraftWireTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftWireScanBuilder(path,
      options.getLong("split.bytes", GraftWireTable.DefaultSplitBytes))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftWireWriteBuilder(path, info.schema(), info.queryId())
}

class GraftWireScanBuilder(path: String, splitBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GraftWireTable.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftWireScan(path, required, splitBytes)
}

class GraftWireScan(path: String, required: StructType,
    splitBytes: Long = GraftWireTable.DefaultSplitBytes)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Size from the file listing (frame payloads dominate the bytes), so
    * Catalyst can cost joins against wire tables — e.g. auto-broadcast a
    * small capture against a large history table. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes: Long = {
      val files = GraftWireTable.listFrameFiles(path)
      val p = new Path(path)
      val fs = p.getFileSystem(new Configuration())
      files.map(f => fs.getFileStatus(new Path(f)).getLen).sum
    }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
  override def description(): String =
    s"GraftWireScan(path=$path, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] =
    GraftWireTable.listFrameFiles(path)
      .flatMap(f => GraftWireTable.planFile(f, splitBytes))
      .map(p => p: InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftWireReaderFactory(required)

  override def toMicroBatchStream(
      checkpointLocation: String): streaming.MicroBatchStream =
    new GraftWireMicroBatchStream(path, required)
}

/** Streaming offset: the sorted set of frame files fully ingested so far.
  * Capture files are append-per-file but arrive whole (the capture layer
  * rotates files), so file granularity is the natural commit unit — the
  * analog of the reference's per-connection stream positions. */
case class GraftWireOffset(files: Seq[String])
    extends streaming.Offset {
  override def json(): String =
    files.sorted.map(f => "\"" + f.replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object GraftWireOffset {
  def fromJson(s: String): GraftWireOffset = {
    // minimal JSON string-array parse (no external deps)
    val items = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(s).map(_.group(1).replace("\\\"", "\"")).toSeq
    GraftWireOffset(items)
  }
}

/** Micro-batch stream over a growing directory of frame files: each
  * trigger ingests the files that appeared since the last committed
  * offset, one [[InputPartition]] per new file (same partition/reader as
  * the batch path — identical decode semantics, proven by the
  * availableNow parity spec). */
class GraftWireMicroBatchStream(path: String, required: StructType)
    extends streaming.MicroBatchStream {
  override def latestOffset(): streaming.Offset =
    GraftWireOffset(GraftWireTable.listFrameFiles(path))

  override def initialOffset(): streaming.Offset = GraftWireOffset(Seq())

  override def deserializeOffset(json: String): streaming.Offset =
    GraftWireOffset.fromJson(json)

  override def commit(end: streaming.Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(
      start: streaming.Offset, end: streaming.Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GraftWireOffset].files.toSet
    // streaming stays one-partition-per-file: capture files arrive whole
    // and rotated, so no trigger ever sees an oversized backlog file
    end.asInstanceOf[GraftWireOffset].files
      .filterNot(seen)
      .map(f => GraftWirePartition(f, 0L, 0L, Long.MaxValue): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftWireReaderFactory(required)
}

/** One frame-aligned byte range of one file: frames whose HEADER starts
  * in [startOffset, endOffset). Unsplit files use (0, 0, MaxValue). */
case class GraftWirePartition(file: String, startOffset: Long,
    startFrameIdx: Long, endOffset: Long) extends InputPartition

class GraftWireReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftWirePartition]
    new GraftWireFrameReader(p, required)
  }
}

/** Sequential frame reader: `[u32 LE length][payload]`*; a trailing
  * truncated frame ends the file early instead of failing the task
  * (untrusted capture data must never fail the job — the reference
  * length-checks every wire read the same way). */
class GraftWireFrameReader(part: GraftWirePartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val file = part.file
  private val needPayload = required.fieldNames.contains("payload")
  private val fileUtf8 = UTF8String.fromString(file)
  private val path = new Path(file)
  private val in: DataInputStream = {
    val fs = path.getFileSystem(new Configuration())
    // frames carry their own length guards; hadoop checksum sidecars would
    // make out-of-band capture appends unreadable
    fs.setVerifyChecksum(false)
    val raw = fs.open(path)
    if (part.startOffset > 0) raw.seek(part.startOffset)
    new DataInputStream(new java.io.BufferedInputStream(raw))
  }
  // byte position of the NEXT frame header; a frame belongs to this
  // partition iff its header starts before endOffset
  private var pos = part.startOffset
  private var idx = part.startFrameIdx - 1L
  private var current: Array[Byte] = _
  private var done = false

  private def readLenLE(): Int = {
    val b0 = in.read(); val b1 = in.read(); val b2 = in.read()
    val b3 = in.read()
    if (b0 < 0) throw new EOFException() // clean end between frames
    if (b3 < 0) { done = true; -1 } // truncated header: stop early
    else b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
  }

  override def next(): Boolean = {
    if (done || pos >= part.endOffset) return false
    try {
      val len = readLenLE()
      if (len < 0) return false
      val buf = new Array[Byte](len)
      try in.readFully(buf)
      catch { case _: EOFException => done = true; return false }
      current = buf
      pos += 4L + len
      idx += 1
      true
    } catch { case _: EOFException => done = true; false }
  }

  override def get(): InternalRow = {
    val values = required.fieldNames.map {
      case "file" => fileUtf8
      case "frame_idx" => java.lang.Long.valueOf(idx)
      case "payload" => if (needPayload) current else null
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = in.close()
}

/** Distributed writer for the wire format (the capture-side analog): each
  * partition of `payloads` becomes one frame file — the same
  * files-as-parallelism layout the source reads back. */
/** D13: the capture-side writer as a FIRST-CLASS DSv2 batch write with
  * the full commit protocol — `df.write.format("graft-wire").save(dir)`
  * (append) / `.mode("overwrite")` (truncate). Each task streams its
  * partition's frames into a temp file the reader cannot see (temps
  * don't end in `.bin` — [[GraftWireTable.listFrameFiles]] filters on
  * the suffix), `commit()` hands the driver a rename intent, and
  * [[GraftWireBatchWrite.commit]] publishes every file with one rename
  * per task — so a failed or speculative task never leaves a partial
  * frame file visible, which the foreachPartition writer this
  * supersedes could not guarantee. `file`/`frame_idx` are
  * storage-assigned on read and ignored on write (metadata columns). */
class GraftWireWriteBuilder(path: String, schema: StructType,
    queryId: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  import org.apache.spark.sql.connector.write._
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftWireBatchWrite(path, doTruncate,
        schema.fieldIndex("payload"), queryId)
  }
}

case class GraftWireCommit(tmpPath: String, finalName: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class GraftWireBatchWrite(path: String, truncate: Boolean, payloadIdx: Int,
    queryId: String)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWireWriterFactory(path, payloadIdx, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dirPath = new Path(path)
    val fs = dirPath.getFileSystem(new Configuration())
    fs.mkdirs(dirPath)
    if (truncate)
      fs.listStatus(dirPath).filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".bin"))
        .foreach(s => fs.delete(s.getPath, false))
    messages.foreach { case GraftWireCommit(tmp, fin) =>
      val dst = new Path(dirPath, fin)
      if (fs.exists(dst)) fs.delete(dst, false) // re-run idempotence
      fs.rename(new Path(tmp), dst)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    messages.filter(_ != null).foreach {
      case GraftWireCommit(tmp, _) =>
        fs.delete(new Path(tmp), false)
      case _ => ()
    }
  }
}

class GraftWireWriterFactory(path: String, payloadIdx: Int, queryId: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftWireDataWriter(path, payloadIdx, queryId, partitionId, taskId)
}

/** Streams `[u32 LE length][payload]` frames to a `.tmp`-suffixed temp
  * (invisible to the reader); the committed name carries the JOB's
  * queryId so an APPEND never collides with — and silently clobbers —
  * a prior capture's `part-w<pid>.bin` (caught by Round11OpsSpec's
  * overwrite/append pin). */
class GraftWireDataWriter(dir: String, payloadIdx: Int, queryId: String,
    pid: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val tmp = new Path(dir, s"part-$queryId-w$pid.bin.$taskId.tmp")
  private lazy val out = {
    val fs = tmp.getFileSystem(new Configuration())
    fs.setWriteChecksum(false)
    fs.mkdirs(new Path(dir))
    new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(tmp, true)))
  }

  override def write(row: InternalRow): Unit = {
    val bytes = row.getBinary(payloadIdx)
    out.write(bytes.length & 0xff)
    out.write((bytes.length >> 8) & 0xff)
    out.write((bytes.length >> 16) & 0xff)
    out.write((bytes.length >> 24) & 0xff)
    out.write(bytes)
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    GraftWireCommit(tmp.toString, s"part-$queryId-w$pid.bin")
  }

  override def abort(): Unit = {
    scala.util.Try(out.close())
    scala.util.Try(
      tmp.getFileSystem(new Configuration()).delete(tmp, false))
  }

  override def close(): Unit = scala.util.Try(out.close())
}

object GraftWireWriter {
  def writeFrames(payloads: org.apache.spark.sql.DataFrame,
      dir: String): Unit = {
    // replace semantics: a previous capture with more partitions must not
    // leave stale frame files behind
    val dirPath = new Path(dir)
    val dfs = dirPath.getFileSystem(new Configuration())
    if (dfs.exists(dirPath)) dfs.delete(dirPath, true)
    dfs.mkdirs(dirPath)
    payloads.select("payload").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val p = new Path(s"$dir/part-$pid.bin")
        val fs = p.getFileSystem(new Configuration())
        fs.setWriteChecksum(false)
        val out = new java.io.DataOutputStream(
          new java.io.BufferedOutputStream(fs.create(p, true)))
        try rows.foreach { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          out.write(bytes.length & 0xff)
          out.write((bytes.length >> 8) & 0xff)
          out.write((bytes.length >> 16) & 0xff)
          out.write((bytes.length >> 24) & 0xff)
          out.write(bytes)
        } finally out.close()
    }
  }
}
