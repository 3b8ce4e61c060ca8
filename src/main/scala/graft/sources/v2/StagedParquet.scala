package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.{Binary, RecordConsumer}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types => PTypes}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path — the staging→prod table lifecycle
  * (reference: postgres.py:948-1180 truncate-and-load, postgres.py:449-559
  * and carto_.py:443-459 rename-replace) as a real V2 commit protocol
  * instead of driver-side helper calls. This is the SINK rung of the
  * extension ladder (expression → aggregate → plan+strategy → optimizer
  * rule → source connector → sink).
  *
  * Shape: [[StagedCatalog]] is a [[StagingTableCatalog]] over a directory
  * tree of parquet tables. `df.writeTo("graft_staged.ns.t").createOrReplace()`
  * plans an ATOMIC replace: Spark asks the catalog to stage the new table
  * ([[StagedCatalog.stageCreateOrReplace]]), runs the query through the
  * staged table's [[BatchWrite]], and only then calls
  * [[StagedTable.commitStagedChanges]] — which promotes the staging
  * directory with the same prod→old / staging→prod rename dance the
  * reference performs with `ALTER TABLE RENAME`. Any failure before that
  * point aborts ([[StagedTable.abortStagedChanges]] deletes staging) and
  * prod is never observed half-written.
  *
  * The task-level protocol is the classic two-phase file commit:
  *  - each [[StagedParquetDataWriter]] writes its partition to a
  *    `_tmp-` prefixed parquet file (via a hand-rolled
  *    [[InternalRowWriteSupport]] — public parquet-hadoop API, no Spark
  *    internals) and renames it to its final name only in task commit();
  *  - the returned [[StagedFileCommit]] names the file, and the driver's
  *    [[StagedParquetBatchWrite.commit]] keeps exactly the files named by
  *    the commit messages — stray files from speculative or failed
  *    attempts are deleted — then publishes `_schema.json` + `_SUCCESS`.
  *
  * At 100 TB this is precisely the object-store pattern: writers upload
  * under a staging prefix, the commit manifest lists the surviving files,
  * and the swap is a metadata operation whose cost is independent of
  * table size.
  */
object StagedParquet {
  val CatalogName = "graft_staged"
  val SchemaFile = "_schema.json"
  val SuccessFile = "_SUCCESS"

  /** Idempotently register the catalog on the session. Setting the same
    * values again is a no-op; the confs only matter before the catalog's
    * first instantiation.
    */
  def ensureCatalog(s: SparkSession,
                    root: String = "/tmp/graft_stage/v2"): Unit = {
    s.conf.set(s"spark.sql.catalog.$CatalogName",
      "graft.sources.v2.StagedCatalog")
    s.conf.set(s"spark.sql.catalog.$CatalogName.root", root)
  }

  private[v2] def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  private[v2] def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Atomic-swap promotion of a fully-written staging dir over prod —
    * same checked-rename contract as TableLifecycle.renameReplace
    * (FileSystem.rename/delete signal failure by returning FALSE; every
    * step is checked so a failed swap can never delete the only copy of
    * prod).
    */
  private[v2] def promote(stagingDir: String, prodDir: String): Unit = {
    val staging = new Path(stagingDir)
    val prod = new Path(prodDir)
    val old = new Path(prodDir + "__old")
    val f = fs(prod)
    if (!f.exists(new Path(staging, SuccessFile)))
      throw new IllegalStateException(
        s"promote: staging $stagingDir has no $SuccessFile — write not committed")
    if (f.exists(old) && !f.delete(old, true))
      throw new java.io.IOException(s"promote: cannot clear $old")
    val hadProd = f.exists(prod)
    if (hadProd && !f.rename(prod, old))
      throw new java.io.IOException(
        s"promote: cannot move prod aside ($prodDir); prod untouched")
    if (!f.rename(staging, prod)) {
      if (hadProd) f.rename(old, prod): Unit // restore before failing
      throw new java.io.IOException(
        s"promote: cannot publish staging ($stagingDir); prod restored")
    }
    f.delete(old, true): Unit // best-effort; prod is already live
  }

  private[v2] def writeString(dir: Path, name: String, content: String): Unit = {
    val f = fs(dir)
    val out = f.create(new Path(dir, name), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
}

// ---------------------------------------------------------------------------
// Catalog
// ---------------------------------------------------------------------------

/** Directory-tree table catalog with atomic staged replacement. Tables are
  * parquet directories under `root/<namespace...>/<name>`; the committed
  * schema is pinned in `_schema.json` so an empty table (truncate target
  * before first load) still loads with its declared schema.
  */
class StagedCatalog extends TableCatalog with StagingTableCatalog {
  import StagedParquet._

  private var catalogName: String = CatalogName
  private var root: String = "/tmp/graft_stage/v2"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(root)
  }
  override def name(): String = catalogName

  private def dir(ident: Identifier): String =
    (root +: ident.namespace.toSeq :+ ident.name).mkString("/")

  private def isCommitted(d: String): Boolean =
    fs(new Path(d)).exists(new Path(d, SuccessFile))

  private def loadSchema(d: String): StructType = {
    val schemaPath = new Path(d, SchemaFile)
    val f = fs(schemaPath)
    if (f.exists(schemaPath)) {
      val in = f.open(schemaPath)
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      DataType.fromJson(json).asInstanceOf[StructType]
    } else SparkSession.active.read.parquet(d).schema
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = new Path((root +: namespace.toSeq).mkString("/"))
    val f = fs(nsDir)
    if (!f.exists(nsDir)) Array.empty
    else f.listStatus(nsDir).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val d = dir(ident)
    if (!isCommitted(d)) throw new NoSuchTableException(ident)
    new StagedParquetTable(ident.name, d, loadSchema(d))
  }

  override def tableExists(ident: Identifier): Boolean = isCommitted(dir(ident))

  private def doCreate(ident: Identifier, schema: StructType): Table = {
    val d = dir(ident)
    if (isCommitted(d)) throw new TableAlreadyExistsException(ident)
    val p = new Path(d)
    fs(p).mkdirs(p)
    writeString(p, SchemaFile, schema.json)
    writeString(p, SuccessFile, "")
    new StagedParquetTable(ident.name, d, schema)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    doCreate(ident, schema)
  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    doCreate(ident, StagedCatalog.toStruct(columns))
  override def createTable(ident: Identifier, info: TableInfo): Table =
    doCreate(ident, info.schema())

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("staged catalog tables are immutable; replace them")

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(dir(ident))
    val f = fs(p)
    f.exists(p) && f.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val to = new Path(dir(newIdent))
    val f = fs(to)
    f.mkdirs(to.getParent)
    if (!f.rename(new Path(dir(oldIdent)), to))
      throw new java.io.IOException(s"renameTable $oldIdent -> $newIdent failed")
  }

  private def doStage(ident: Identifier, schema: StructType): StagedTable = {
    val prod = dir(ident)
    val staging = prod + "__staging." +
      java.util.UUID.randomUUID.toString.take(8)
    val parent = new Path(prod).getParent
    fs(parent).mkdirs(parent)
    new StagedReplaceTable(ident.name, prod, staging, schema)
  }

  // all three signature families funnel into doStage — overridden
  // explicitly so the interface defaults' delegation direction is moot
  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    doStage(ident, schema)
  override def stageCreate(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    doStage(ident, StagedCatalog.toStruct(columns))
  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable =
    doStage(ident, info.schema())
  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    doStage(ident, schema)
  override def stageReplace(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    doStage(ident, StagedCatalog.toStruct(columns))
  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable =
    doStage(ident, info.schema())
  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    doStage(ident, schema)
  override def stageCreateOrReplace(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    doStage(ident, StagedCatalog.toStruct(columns))
  override def stageCreateOrReplace(ident: Identifier, info: TableInfo): StagedTable =
    doStage(ident, info.schema())
}

object StagedCatalog {
  private[v2] def toStruct(columns: Array[Column]): StructType =
    StructType(columns.map(c => StructField(c.name, c.dataType, c.nullable)))
}

// ---------------------------------------------------------------------------
// Tables
// ---------------------------------------------------------------------------

/** A committed table: append lands files in-place (two-phase, stray-safe);
  * truncate() stages a full replacement and swaps at batch commit — the
  * reference's TRUNCATE + bulk COPY as one atomic V2 write.
  */
class StagedParquetTable(tableName: String, prodDir: String, tableSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          if (replace)
            new StagedParquetBatchWrite(
              prodDir + "__staging." + info.queryId().take(8),
              Some(prodDir), info.schema())
          else new StagedParquetBatchWrite(prodDir, None, info.schema())
        override def description(): String =
          s"StagedParquetWrite(table=$tableName, mode=${if (replace) "truncate" else "append"})"
      }
    }
}

/** The staging side of an atomic REPLACE: Spark writes the query through
  * this table's BatchWrite into the staging dir, then commitStagedChanges
  * performs the swap — or abortStagedChanges deletes staging with prod
  * never touched.
  */
class StagedReplaceTable(tableName: String, prodDir: String, stagingDir: String,
                         tableSchema: StructType)
    extends StagedTable with SupportsWrite {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // staging dir starts empty
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new StagedParquetBatchWrite(stagingDir, None, info.schema())
        override def description(): String =
          s"StagedParquetWrite(table=$tableName, mode=replace-staged)"
      }
    }

  override def commitStagedChanges(): Unit =
    StagedParquet.promote(stagingDir, prodDir)

  override def abortStagedChanges(): Unit = {
    val p = new Path(stagingDir)
    StagedParquet.fs(p).delete(p, true): Unit
  }
}

// ---------------------------------------------------------------------------
// Batch write: two-phase file commit
// ---------------------------------------------------------------------------

case class StagedFileCommit(file: String, rows: Long) extends WriterCommitMessage

/** @param targetDir  where task files land (staging dir, or prod for append)
  * @param promoteTo  Some(prod) when driver commit should also swap
  *                   targetDir over prod (the truncate-load path);
  *                   None when the swap belongs to commitStagedChanges
  *                   (staged replace) or no swap is wanted (append).
  */
class StagedParquetBatchWrite(targetDir: String, promoteTo: Option[String],
                              schema: StructType) extends BatchWrite {
  import StagedParquet._

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    StagedParquetWriterFactory(targetDir, schema)

  private def isStagingTarget: Boolean =
    promoteTo.isDefined || targetDir.contains("__staging")

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(targetDir)
    val f = fs(p)
    val committed = messages.map(_.asInstanceOf[StagedFileCommit].file).toSet
    // Staging dirs started empty, so they must end holding exactly the
    // committed files — losers of speculative races are deleted before
    // publication. In append mode the dir also holds the table's PRIOR
    // files, which must survive: only this job's unrenamed _tmp- leftovers
    // are swept (a task file gets its committed name only via the task
    // commit rename, so a stray can never wear one).
    f.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      val stray =
        if (isStagingTarget) n.endsWith(".parquet") && !committed(n)
        else n.startsWith("_tmp-")
      if (stray) f.delete(st.getPath, true)
    }
    committed.foreach { n =>
      if (!f.exists(new Path(p, n)))
        throw new IllegalStateException(s"commit: committed file $n missing in $targetDir")
    }
    writeString(p, SchemaFile, schema.json)
    writeString(p, SuccessFile, "")
    promoteTo.foreach(prod => promote(targetDir, prod))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(targetDir)
    val f = fs(p)
    if (promoteTo.isEmpty && !targetDir.contains("__staging")) {
      // append mode aborted: remove only this job's temp files; the
      // committed table contents stay intact
      f.listStatus(p).foreach { st =>
        if (st.getPath.getName.startsWith("_tmp-")) f.delete(st.getPath, true)
      }
    } else f.delete(p, true): Unit // staging dir: drop wholesale, prod untouched
  }
}

case class StagedParquetWriterFactory(targetDir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new StagedParquetDataWriter(targetDir, partitionId, taskId, schema)
}

/** One task's writer: parquet rows stream to `_tmp-<file>`; task commit
  * renames to the final name (so a file is visible under its committed
  * name only if the task committed) and reports it to the driver.
  */
class StagedParquetDataWriter(targetDir: String, partitionId: Int, taskId: Long,
                              schema: StructType) extends DataWriter[InternalRow] {
  private val fileName = f"part-$partitionId%05d-$taskId.snappy.parquet"
  private val conf = new Configuration()
  private val tmpPath = new Path(targetDir, s"_tmp-$fileName")
  private val writer: ParquetWriter[InternalRow] = {
    val f = tmpPath.getFileSystem(conf)
    f.mkdirs(new Path(targetDir)): Unit
    f.delete(tmpPath, false): Unit // stale attempt leftovers
    new InternalRowParquetBuilder(tmpPath, schema)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }
  private var rows = 0L
  private var closed = false

  override def write(row: InternalRow): Unit = { writer.write(row); rows += 1 }

  override def commit(): WriterCommitMessage = {
    close()
    val f = tmpPath.getFileSystem(conf)
    if (!f.rename(tmpPath, new Path(targetDir, fileName)))
      throw new java.io.IOException(s"task commit: cannot rename $tmpPath")
    StagedFileCommit(fileName, rows)
  }

  override def abort(): Unit = {
    try close() catch { case _: Throwable => () }
    tmpPath.getFileSystem(conf).delete(tmpPath, false): Unit
  }

  override def close(): Unit =
    if (!closed) { closed = true; writer.close() }
}

// ---------------------------------------------------------------------------
// InternalRow -> parquet, via public parquet-hadoop API only
// ---------------------------------------------------------------------------

private[v2] class InternalRowParquetBuilder(path: Path, schema: StructType)
    extends ParquetWriter.Builder[InternalRow, InternalRowParquetBuilder](path) {
  override def self(): InternalRowParquetBuilder = this
  override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
    new InternalRowWriteSupport(schema)
}

/** Minimal WriteSupport for flat schemas over the engine's scalar types.
  * The physical encodings mirror Spark's own non-legacy writer so a
  * read-back through spark.read.parquet reproduces the logical types
  * bit-for-bit: strings as UTF8 binary, decimals ≤9/≤18 digits as
  * annotated INT32/INT64 unscaled values, timestamps as UTC-adjusted
  * INT64 micros, dates as INT32 days.
  */
private[v2] class InternalRowWriteSupport(schema: StructType)
    extends WriteSupport[InternalRow] {

  private var consumer: RecordConsumer = _

  private val parquetType: MessageType = {
    val b = PTypes.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case BooleanType => PTypes.optional(PrimitiveTypeName.BOOLEAN).named(f.name)
        case IntegerType => PTypes.optional(PrimitiveTypeName.INT32).named(f.name)
        case LongType    => PTypes.optional(PrimitiveTypeName.INT64).named(f.name)
        case FloatType   => PTypes.optional(PrimitiveTypeName.FLOAT).named(f.name)
        case DoubleType  => PTypes.optional(PrimitiveTypeName.DOUBLE).named(f.name)
        case StringType  => PTypes.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case BinaryType  => PTypes.optional(PrimitiveTypeName.BINARY).named(f.name)
        case d: DecimalType if d.precision <= 9 =>
          PTypes.optional(PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision)).named(f.name)
        case d: DecimalType if d.precision <= 18 =>
          PTypes.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision)).named(f.name)
        case DateType => PTypes.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case TimestampType => PTypes.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case other => throw new UnsupportedOperationException(
          s"StagedParquet sink: unsupported column type $other for ${f.name}")
      }
      b.addField(t)
    }
    b.named("spark_schema")
  }

  // per-field emitters resolved once, not per row
  private val emitters: Array[(InternalRow, Int) => Unit] =
    schema.fields.map { f =>
      f.dataType match {
        case BooleanType => (r: InternalRow, i: Int) => consumer.addBoolean(r.getBoolean(i))
        case IntegerType | DateType => (r: InternalRow, i: Int) => consumer.addInteger(r.getInt(i))
        case LongType | TimestampType => (r: InternalRow, i: Int) => consumer.addLong(r.getLong(i))
        case FloatType => (r: InternalRow, i: Int) => consumer.addFloat(r.getFloat(i))
        case DoubleType => (r: InternalRow, i: Int) => consumer.addDouble(r.getDouble(i))
        case StringType => (r: InternalRow, i: Int) =>
          consumer.addBinary(Binary.fromReusedByteArray(r.getUTF8String(i).getBytes))
        case BinaryType => (r: InternalRow, i: Int) =>
          consumer.addBinary(Binary.fromReusedByteArray(r.getBinary(i)))
        case d: DecimalType if d.precision <= 9 => (r: InternalRow, i: Int) =>
          consumer.addInteger(r.getDecimal(i, d.precision, d.scale).toUnscaledLong.toInt)
        case d: DecimalType if d.precision <= 18 => (r: InternalRow, i: Int) =>
          consumer.addLong(r.getDecimal(i, d.precision, d.scale).toUnscaledLong)
        case other => throw new UnsupportedOperationException(other.toString)
      }
    }

  override def init(conf: Configuration): WriteSupport.WriteContext =
    new WriteSupport.WriteContext(parquetType,
      Map.empty[String, String].asJava)

  override def prepareForWrite(rc: RecordConsumer): Unit = consumer = rc

  override def write(row: InternalRow): Unit = {
    consumer.startMessage()
    var i = 0
    while (i < emitters.length) {
      if (!row.isNullAt(i)) {
        val n = schema.fields(i).name
        consumer.startField(n, i)
        emitters(i)(row, i)
        consumer.endField(n, i)
      }
      i += 1
    }
    consumer.endMessage()
  }
}
