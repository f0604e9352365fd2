package graft.sources.avro

import java.util
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-avro` DataSource V2 source AND sink — the Avro leg of the
  * storage-format matrix (parquet/ORC/CSV/JSONL are q01/q173/q189/q161).
  * The Spark distribution in this environment ships the Avro LIBRARY
  * (avro-1.12) but not the `spark-avro` datasource module, so the
  * connector is built directly on the library through the same DSv2
  * surface as the `sap-rfc` source.
  *
  * Layout and scale model (the classic Avro-on-a-data-lake baseline):
  *  - a dataset is a directory of `part-*.avro` object-container files
  *    plus, once truncated, a `_generation` pointer naming the current
  *    generation (see the generation-pointer protocol notes on
  *    [[AvroDataSource]] — overwrite is one atomic pointer flip, so no
  *    crash point or read window ever shows duplicated or lost data);
  *  - the WRITE side emits one container file per task (append), so
  *    write parallelism is the upstream partitioning, exactly like the
  *    built-in file sinks; tasks STAGE under `.…inprogress` names and
  *    publish by atomic rename at task commit (see [[AvroDataWriter]]
  *    — torn files and hard-crash orphans are never reader-visible),
  *    and job commit drops a `_SUCCESS` marker;
  *  - the READ side plans one [[InputPartition]] per container file —
  *    at 100 TB you size container files like parquet row-group files
  *    (the writer's upstream `repartition` is the knob), which keeps
  *    file-granularity scheduling balanced without block-level splits;
  *  - COLUMN PRUNING pushes down as an Avro READER schema holding only
  *    the referenced fields: Avro's schema resolution skips unreferenced
  *    fields at decode time, so a 2-column projection of a 20-column
  *    record never materializes the other 18 (row-major bytes are still
  *    read — the documented cost of the format vs parquet; no filter
  *    pushdown for the same reason: container files carry no column
  *    statistics).
  *
  * Schema evolution on read: the table schema is the MERGE of every
  * container's header schema (fields united by name, same-type
  * required), and every written field is `union(null, T)` with a null
  * default, so a directory holding files from BEFORE a column was
  * added reads the full current layout — Avro's per-file schema
  * resolution fills the missing field with null (AvroSourceSpec pins
  * both append orders).
  *
  * Type mapping (both directions, nullable as `union(null, T)`):
  * long↔long, int↔int, double↔double, float↔float, boolean↔boolean,
  * string↔string, binary↔bytes, timestamp↔long/timestamp-micros,
  * timestamp_ntz↔long/local-timestamp-micros, date↔int/date. Logical
  * types ride as raw long/int on both paths — Spark's internal
  * micros/days encodings are exactly Avro's, so no conversion layer
  * (and no engine-dependent rounding) exists.
  *
  * Hadoop FS API throughout (not java.io), so the same code addresses
  * HDFS/S3A on a real cluster; tasks read the default `Configuration`
  * (core-site.xml on the executor classpath) rather than shipping the
  * driver's, which keeps every plan object trivially serializable. */
class AvroTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  /** Merges the header schemas of EVERY container in the directory
    * (fields united by name, first-seen order, same-type required):
    * without the merge, the table schema would be whichever file
    * happened to sort first, and the natural append order — old
    * narrow files first — would silently drop a later-added column
    * (r12 review). Header reads are cheap (bytes per file) and ride
    * the listing the scan needs anyway; per-file resolution then
    * fills fields missing from old files with null via the
    * union-null defaults. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = AvroDataSource.pathOf(options)
    val files = AvroDataSource.listVisibleFiles(path)
    require(files.nonEmpty, s"graft-avro: no *.avro files under $path")
    val conf = new Configuration()
    val perFile = files.map { f =>
      val in = f.getFileSystem(conf).open(f)
      try {
        val stream = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        try AvroConv.toSpark(stream.getSchema)
        finally stream.close()
      } finally in.close()
    }
    perFile.reduceLeft { (acc, next) =>
      val known = acc.fields.map(f => f.name -> f.dataType).toMap
      next.fields.foreach { f =>
        known.get(f.name).foreach { t =>
          require(t == f.dataType,
            s"graft-avro: field ${f.name} has conflicting types across " +
              s"containers ($t vs ${f.dataType}) — rewrite before reading")
        }
      }
      StructType(acc.fields ++ next.fields.filterNot(f =>
        known.contains(f.name)))
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    AvroTable(properties.asScala.getOrElse("path",
      sys.error("graft-avro requires a path")), schema)
}

private[avro] object AvroDataSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-avro requires a path")
    p
  }

  def listAvroFiles(path: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath)
      .sortBy(_.getName) // deterministic partition order
  }

  // ---- generation pointer (r13: crash-atomic truncate) -----------------
  // A truncate commit publishes its containers under a FRESH generation
  // token (`gen-<tok>-part-….avro`) and then atomically renames the
  // `_generation` pointer onto the new token. Readers resolve the
  // pointer first, so the old→new flip is one atomic rename: no window
  // shows old+new together (duplicates) and no crash point leaves
  // neither readable — before the flip the old generation is fully
  // intact, after it the new one is fully published (its renames all
  // happened at task commit, before job commit ran). Old files and
  // crashed-attempt orphans are invisible garbage, swept after the
  // flip and by later truncates. Dirs never truncated by this protocol
  // have no pointer; their visible set is the unprefixed append files.

  private[avro] val GenPointer = "_generation"
  private[avro] def genPrefix(token: String): String = s"gen-$token-"

  private[avro] def currentToken(path: String): Option[String] = {
    val p = new Path(path, GenPointer)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val line = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8")).readLine()
        Option(line).map(_.trim).filter(_.nonEmpty)
      } finally in.close()
    }
  }

  /** Atomic pointer flip: staged write + `FileContext` rename with
    * OVERWRITE (atomic on HDFS and local FS). */
  private[avro] def flipPointer(path: String, token: String): Unit = {
    val conf = new Configuration()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val tmp = new Path(dir,
      s".${GenPointer}.${UUID.randomUUID().toString.take(8)}.inprogress")
    val out = fs.create(tmp, true)
    try out.write(token.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
    fc.rename(tmp, new Path(dir, GenPointer),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The reader-visible containers: the current generation's files
    * when a pointer exists, the unprefixed append files otherwise.
    *
    * Pointer-bracketed listing (r13 review): the pointer is read
    * BEFORE and AFTER the directory listing, and the listing only
    * counts when both reads agree — a truncate flipping mid-listing
    * would otherwise let a reader silently see a PARTIAL generation
    * (half the new files, or survivors of a mid-sweep old one). A
    * stable bracket is consistent: the named generation's files were
    * all published before its flip and are never deleted while the
    * pointer still names it (the next truncate flips first). Under a
    * persistent storm of concurrent truncates the read fails LOUDLY
    * as retryable, never silently short. */
  def listVisibleFiles(path: String): Seq[Path] = {
    var attempt = 0
    while (attempt < 5) {
      val before = currentToken(path)
      val all = listAvroFiles(path)
      val after = currentToken(path)
      if (before == after) {
        return before match {
          case Some(tok) => all.filter(_.getName.startsWith(genPrefix(tok)))
          case None => all.filterNot(_.getName.startsWith("gen-"))
        }
      }
      attempt += 1
    }
    sys.error(s"graft-avro: generation pointer of $path kept moving " +
      "across 5 listing attempts — concurrent truncates in progress; " +
      "retry the read")
  }
}

/** Spark ↔ Avro schema/value conversion (see provider doc for the
  * mapping table). */
private[avro] object AvroConv {
  def toAvro(st: StructType): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          LogicalTypes.timestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        case TimestampNTZType =>
          LogicalTypes.localTimestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case other =>
          sys.error(s"graft-avro: unsupported write type $other (${f.name})")
      }
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), base),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord("graft_row", null, "graft.avro", false,
      fields.toList.asJava)
  }

  def toSpark(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD,
      s"graft-avro: top-level schema must be a record, got ${s.getType}")
    StructType(s.getFields.asScala.toSeq.map { f =>
      val (tpe, nullable) = unwrap(f.schema())
      StructField(f.name(), tpe, nullable)
    })
  }

  private def unwrap(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"graft-avro: only union(null, T) is supported, got $s")
      (unwrap(nonNull.head)._1, branches.size > nonNull.size)
    case Schema.Type.LONG =>
      (s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros => TimestampType
        case _: LogicalTypes.LocalTimestampMicros => TimestampNTZType
        case _ => LongType
      }, false)
    case Schema.Type.INT =>
      (s.getLogicalType match {
        case _: LogicalTypes.Date => DateType
        case _ => IntegerType
      }, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case other => sys.error(s"graft-avro: unsupported read type $other")
  }

  /** Avro record value → Catalyst value for one field. */
  def toCatalyst(v: Any, dt: DataType): Any = v match {
    case null => null
    case u: Utf8 => UTF8String.fromBytes(u.getBytes, 0, u.getByteLength)
    case s: String => UTF8String.fromString(s)
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case other => other // long/int/double/float/boolean ride as-is
  }

  /** Catalyst value → Avro record value for one field. */
  def toAvroValue(row: InternalRow, i: Int, dt: DataType): Any =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType | TimestampType | TimestampNTZType => row.getLong(i)
      case IntegerType | DateType => row.getInt(i)
      case DoubleType => row.getDouble(i)
      case FloatType => row.getFloat(i)
      case BooleanType => row.getBoolean(i)
      case StringType =>
        val u = row.getUTF8String(i); new Utf8(u.getBytes)
      case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
      case other => sys.error(s"graft-avro: unsupported write type $other")
    }
}

case class AvroTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(path, info.schema())
}

class AvroScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(r: StructType): Unit =
    // empty projection (count(*)-style) still needs ≥1 field to drive
    // record iteration; keep the first
    required = if (r.fields.isEmpty) StructType(full.fields.take(1)) else r
  override def build(): Scan = AvroScan(path, required)
}

case class AvroScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro $path ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] =
    AvroDataSource.listVisibleFiles(path)
      .map(p => AvroFilePartition(p.toString): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    AvroReaderFactory(required)
}

case class AvroFilePartition(file: String) extends InputPartition

case class AvroReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(p.asInstanceOf[AvroFilePartition].file, required)
}

/** Streams one container file; the pruned READER schema makes Avro's
  * resolver skip every unreferenced field at decode time. */
class AvroPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(file)
    p.getFileSystem(new Configuration()).open(p)
  }
  private val stream = new DataFileStream[GenericRecord](
    in, new GenericDatumReader[GenericRecord](null, AvroConv.toAvro(required)))
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!stream.hasNext) false
    else {
      val rec = stream.next()
      val vals = new Array[Any](required.length)
      var i = 0
      while (i < required.length) {
        vals(i) = AvroConv.toCatalyst(rec.get(i), required(i).dataType)
        i += 1
      }
      current = new GenericInternalRow(vals)
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = { stream.close(); in.close() }
}

class AvroWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = AvroBatchWrite(path, schema, doTruncate)
  }
}

case class AvroCommit(file: String) extends WriterCommitMessage

case class AvroBatchWrite(path: String, schema: StructType,
                          truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = AvroWriterFactory(path, schema, token)

  // truncate jobs mint a FRESH generation token on the driver; append
  // jobs join the directory's current generation (None for a
  // never-truncated dir — unprefixed files)
  private val token: Option[String] =
    if (truncate)
      Some(f"${System.currentTimeMillis()}%013x-${
        UUID.randomUUID().toString.take(8)}")
    else AvroDataSource.currentToken(path)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    if (truncate) {
      // Crash-atomic overwrite (r13 review — the first r13 cut deleted
      // old files before publishing new ones, so a driver crash inside
      // the commit lost BOTH datasets): the new containers are already
      // fully published (task-commit renames) under the fresh token,
      // but readers cannot see them — no pointer names that token. The
      // flip below is ONE atomic rename: before it the old generation
      // is intact and complete, after it the new one is. Only then is
      // garbage swept (STRICTLY-OLDER-generation containers,
      // crashed-attempt orphans of older tokens, provably-stale
      // staging files); a crash mid-sweep leaves invisible garbage for
      // the next truncate, never an unreadable or duplicated dataset.
      // A reader holding a pre-flip file listing can hit a swept old
      // file — the documented retryable read (BatchCommitLog.compact's
      // contract).
      // Concurrent-truncate discipline (r13 advice: the old sweep
      // deleted ANY other generation's files, so truncate T1's
      // post-flip sweep could silently destroy a concurrent T2's
      // already-published-but-not-yet-flipped generation — T2 then
      // flipped onto swept files and readers saw a stable, partial
      // dataset). Four guards, all loud, none silent:
      //  1. ordering pre-check — tokens embed a zero-padded millis-hex
      //     prefix, so lexicographic compare is time order; if the
      //     pointer already names a NEWER token, this truncate lost
      //     the race and must not un-flip it;
      //  2. the sweep is scoped to generations STRICTLY OLDER than the
      //     committing token (plus unprefixed legacy append files) —
      //     a newer in-flight generation's files are never touched;
      //  3. post-sweep pointer re-read — if a newer truncate flipped
      //     past us mid-commit, our rows are not visible: fail loudly
      //     (the append path's existing discipline);
      //  4. committed-file existence check — the one residual
      //     interleaving (an OLDER-token truncate whose pre-check
      //     raced past a newer flip) surfaces here as missing files
      //     instead of a silent empty read; the failed truncate must
      //     be retried.
      // Net: concurrent truncates are last-writer-wins; the loser
      // FAILS; no interleaving reports success over lost data.
      val tok = token.get
      val keep = AvroDataSource.genPrefix(tok)
      AvroDataSource.currentToken(path).foreach { cur =>
        if (cur > tok)
          sys.error(s"graft-avro: a newer truncate (generation $cur) " +
            s"already committed to $path — this truncate ($tok) lost " +
            "the race; its rows are not visible; retry if still wanted")
      }
      AvroDataSource.flipPointer(path, tok)
      AvroDataSource.listAvroFiles(path)
        .filterNot(_.getName.startsWith(keep))
        .filter { p =>
          val nm = p.getName
          !nm.startsWith("gen-") || nm < keep
        }
        .foreach(p => fs.delete(p, false))
      if (!AvroDataSource.currentToken(path).contains(tok))
        sys.error(s"graft-avro: generation of $path changed during a " +
          s"truncate commit (concurrent truncate superseded $tok) — " +
          "this job's rows are not visible; retry if still wanted")
      val missing = messages.collect {
        case AvroCommit(f) if !fs.exists(new Path(dir, f)) => f
      }
      if (missing.nonEmpty)
        sys.error(s"graft-avro: ${missing.length} committed container(s) " +
          s"of generation $tok were swept by a concurrent truncate of " +
          s"$path (e.g. ${missing.head}) — the pointer may name an " +
          "incomplete generation; retry the truncate")
      // stage-file GC: only provably-stale orphans (same age cutoff as
      // the append path) — an unconditional sweep would delete a
      // concurrent job's in-flight staging files
      val stagingCutoff = System.currentTimeMillis() -
        AvroBatchWrite.OrphanSweepAgeMs
      if (fs.exists(dir)) fs.listStatus(dir)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".inprogress")
          && s.getModificationTime < stagingCutoff)
        .foreach(s => fs.delete(s.getPath, false))
    } else {
      // append: files were published at task commit (visible as tasks
      // finish, standard file-sink semantics). A truncate that
      // committed CONCURRENTLY flipped the pointer after this job
      // captured its token — the appended files landed under the
      // retired generation and no reader will ever see them, so fail
      // the job LOUDLY instead of reporting a silent no-op success
      // (r13 review); the stranded files are invisible garbage the
      // next truncate sweeps, and the caller retries against the new
      // generation.
      if (AvroDataSource.currentToken(path) != token)
        sys.error(s"graft-avro: generation of $path changed during an " +
          "append (concurrent truncate) — the appended rows are not " +
          "visible; retry the append")
      // age-out staging orphans from hard-crashed attempts that are
      // provably stale — far older than any plausible in-flight task —
      // so the sweep cannot race a concurrent writer (r12 advice;
      // previously they leaked forever)
      val cutoff = System.currentTimeMillis() -
        AvroBatchWrite.OrphanSweepAgeMs
      if (fs.exists(dir)) fs.listStatus(dir)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".inprogress")
          && s.getModificationTime < cutoff)
        .foreach(s => fs.delete(s.getPath, false))
    }
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    messages.filter(_ != null).foreach { m =>
      fs.delete(new Path(dir, m.asInstanceOf[AvroCommit].file), false)
    }
  }
}

object AvroBatchWrite {
  /** Append-commit orphan sweep age: a `.inprogress` file untouched for
    * this long cannot be a live task's output (container writers flush
    * continuously), so sweeping it cannot race a concurrent writer. */
  private[avro] val OrphanSweepAgeMs: Long = 24L * 3600 * 1000
}

case class AvroWriterFactory(path: String, schema: StructType,
                             token: Option[String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new AvroDataWriter(path, schema, partitionId, taskId, token)
}

/** One container file per task (deflate-compressed — the codec in Avro
  * core, no optional native lib). Task output is STAGED under a
  * `.…avro.inprogress` name — invisible to readers, which list only
  * `*.avro` — and renamed to its final name at TASK COMMIT (atomic on
  * HDFS and local FS). A truncate job's final names carry the job's
  * fresh generation token, so they stay READER-invisible even after
  * publication (no pointer names the token until job commit flips it
  * — the r13 crash-atomic overwrite protocol). So:
  *  - a concurrent reader never sees a truncated container;
  *  - a hard-crashed attempt (whose abort() can never run) leaves only
  *    an invisible `.inprogress` orphan — or, for a crashed TRUNCATE
  *    job, published files of a token no pointer will ever name —
  *    never reader-visible data. Both kinds are swept by the next
  *    truncate commit; append commits age-out provably-stale staging
  *    orphans ([[AvroBatchWrite.OrphanSweepAgeMs]]).
  * The unique name additionally makes speculative / retried attempts
  * collision-free. */
class AvroDataWriter(path: String, schema: StructType, partitionId: Int,
                     taskId: Long, token: Option[String])
    extends DataWriter[InternalRow] {
  private val avroSchema = AvroConv.toAvro(schema)
  private val fileName =
    token.map(AvroDataSource.genPrefix).getOrElse("") +
      f"part-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.avro"
  private val stagedName = s".$fileName.inprogress"
  private val fs = new Path(path).getFileSystem(new Configuration())
  private val out = fs.create(new Path(new Path(path), stagedName), true)
  private val writer = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(avroSchema, out)
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.length) {
      rec.put(i, AvroConv.toAvroValue(row, i, schema(i).dataType))
      i += 1
    }
    writer.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    val dir = new Path(path)
    if (!fs.rename(new Path(dir, stagedName), new Path(dir, fileName)))
      sys.error(s"graft-avro: failed to publish $stagedName -> $fileName")
    AvroCommit(fileName)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    fs.delete(new Path(new Path(path), stagedName), false)
  }

  override def close(): Unit = ()
}

