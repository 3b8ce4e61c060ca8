package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.{InitContext, ReadSupport}
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter, RecordMaterializer}
import org.apache.parquet.schema.MessageType

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 READ path for the staged catalog — the scan-side twin of
  * the staged write, built so the catalog's partitioned tables participate
  * in Spark's STORAGE-PARTITIONED JOINS (SPARK-37375): the scan reports
  * [[KeyGroupedPartitioning]] over its identity transforms and every input
  * split carries [[HasPartitionKey]], so with
  * `spark.sql.sources.v2.bucketing.enabled` two tables partitioned on the
  * same key join WITHOUT EITHER SIDE SHUFFLING — at 100 TB that deletes
  * the single largest cost of a fact-fact join (both exchanges), the same
  * mechanism Iceberg/Delta use for bucket-co-located joins. A downstream
  * aggregate on the partition key rides the same distribution (no
  * exchange either).
  *
  * The scan also does the two prunings a V2 source owes the optimizer:
  *   - COLUMN pruning ([[SupportsPushDownRequiredColumns]]): only
  *     requested data columns are decoded — the parquet projection is the
  *     requested subset of the file schema, and files predating an ADD
  *     COLUMN null-fill absent fields at materialization (the read half of
  *     metadata-only schema evolution);
  *   - PARTITION pruning ([[SupportsPushDownFilters]]): EqualTo/In
  *     predicates on identity partition columns drop whole directories at
  *     plan time, before any file is opened. All filters are returned as
  *     residuals — Spark re-checks rows, the scan only skips I/O, so a
  *     miscast literal can never produce wrong rows, only wasted reads.
  *
  * Decoding goes through a hand-rolled parquet-hadoop [[ReadSupport]]
  * (public API only, mirroring the sink's WriteSupport): flat scalar
  * schemas — exactly what the lifecycle tables carry; nested read-back
  * stays on spark.read.parquet via [[StagedParquet.readTable]]. One input
  * split per partition directory: partition count, not file count, is the
  * parallelism grain, which is what key-grouped planning groups anyway.
  */
class StagedScanBuilder(tableName: String, prodDir: String,
                        tableSchema: StructType, partSpec: Seq[PartField])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = tableSchema
  private var partPruning: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val identityCols = partSpec.filter(_.kind == "identity").map(_.name).toSet
    partPruning = filters.filter {
      case EqualTo(a, _) => identityCols(a)
      case In(a, _)      => identityCols(a)
      case IsNotNull(a)  => identityCols(a)
      case _             => false
    }
    filters // everything stays a residual: pruning only skips I/O
  }

  override def pushedFilters(): Array[Filter] = partPruning

  override def build(): Scan =
    new StagedScan(tableName, prodDir, tableSchema, required, partSpec,
      partPruning.toSeq)
}

class StagedScan(tableName: String, prodDir: String, tableSchema: StructType,
                 required: StructType, partSpec: Seq[PartField],
                 pruning: Seq[Filter])
    extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** One split per committed partition directory, pruned by the pushed
    * identity-column predicates. Evaluated once; [[outputPartitioning]]
    * must agree with the planned split count.
    */
  private lazy val planned: Array[StagedInputPartition] = {
    val root = new Path(prodDir)
    val f = StagedParquet.fs(root)
    if (!f.exists(root)) Array.empty
    else {
      def walk(dir: Path, depth: Int, values: List[String]): Seq[(List[String], Path)] =
        if (depth == 0) Seq((values.reverse, dir))
        else f.listStatus(dir).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.contains("="))
          .flatMap(st => walk(st.getPath, depth - 1,
            st.getPath.getName.split("=", 2)(1) :: values))
      val dirs = walk(root, partSpec.length, Nil)
      val kept = dirs.filter { case (vals, _) => partitionSurvives(vals) }
      kept.map { case (vals, dir) =>
        val files = f.listStatus(dir).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet") &&
            !st.getPath.getName.startsWith("_"))
          .map(_.getPath.toString).sorted
        StagedInputPartition(vals, files, tableSchema.json, partSpec,
          required.fieldNames.toSeq)
      }.filter(_.files.nonEmpty).sortBy(_.rawValues.mkString("/")).toArray
    }
  }

  /** Identity-partition pruning: compare the typed directory value against
    * the pushed literal — CONSERVATIVELY. A residual filter cannot
    * resurrect skipped I/O, so any comparison this code cannot canonicalize
    * with certainty keeps the partition (wasted read, never a lost row).
    */
  private def partitionSurvives(vals: Seq[String]): Boolean = {
    // canonical comparable form for both dir values and filter literals
    def canon(v: Any): Any = v match {
      case u: UTF8String          => u.toString
      case d: java.sql.Date       => d.toLocalDate.toEpochDay.toInt
      case d: java.time.LocalDate => d.toEpochDay.toInt
      case other                  => other
    }
    def typed(name: String): Option[Any] = {
      val i = partSpec.indexWhere(_.name == name)
      if (i < 0) None
      else Some(canon(StagedScan.partValue(
        tableSchema(partSpec(i).name).dataType, vals(i))))
    }
    pruning.forall {
      case EqualTo(a, v) => typed(a).forall(t => t != null && t == canon(v))
      case In(a, vs)     => typed(a).forall(t => vs.map(canon).contains(t))
      case IsNotNull(a)  => typed(a).forall(_ != null)
      case _             => true
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    planned.toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    StagedReaderFactory(tableSchema.json, partSpec, required.fieldNames.toSeq)

  /** Key-grouped over the identity transforms — the SPJ contract. Tables
    * with a non-identity transform (days) read fine but report unknown
    * partitioning; unpartitioned tables likewise.
    */
  override def outputPartitioning(): Partitioning =
    if (partSpec.nonEmpty && partSpec.forall(_.kind == "identity"))
      new KeyGroupedPartitioning(
        partSpec.map(p => Expressions.identity(p.name):
          org.apache.spark.sql.connector.expressions.Expression).toArray,
        planned.length)
    else new UnknownPartitioning(planned.length)

  override def description(): String =
    s"StagedScan(table=$tableName, partitions=${planned.length}, " +
      s"columns=[${required.fieldNames.mkString(",")}], " +
      s"pruning=[${pruning.mkString(",")}])"
}

object StagedScan {
  /** Typed (internal-representation) value of an identity partition
    * directory segment — inverse of [[PartSpec.partEvaluators]].
    */
  def partValue(dt: DataType, raw: String): Any =
    if (raw == "__HIVE_DEFAULT_PARTITION__") null
    else dt match {
      case StringType  => UTF8String.fromString(PartSpec.unescape(raw))
      case IntegerType => raw.toInt
      case LongType    => raw.toLong
      case DateType    => java.time.LocalDate.parse(raw).toEpochDay.toInt
      case other => throw new UnsupportedOperationException(
        s"staged scan: unsupported identity partition type $other")
    }
}

/** @param rawValues    identity partition dir values, partSpec order
  * @param files        absolute paths of this partition's committed files
  * @param schemaJson   full DECLARED table schema (evolution-aware)
  * @param requiredCols scan output columns, output order
  */
case class StagedInputPartition(rawValues: Seq[String], files: Seq[String],
                                schemaJson: String, partSpec: Seq[PartField],
                                requiredCols: Seq[String])
    extends InputPartition with HasPartitionKey {

  /** The split's partition-key row: typed identity values in transform
    * order — what Spark's key-grouped planner groups and co-locates on.
    */
  override def partitionKey(): InternalRow = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    new GenericInternalRow(partSpec.zip(rawValues).map { case (pf, raw) =>
      StagedScan.partValue(schema(pf.name).dataType, raw)
    }.toArray[Any])
  }
}

case class StagedReaderFactory(schemaJson: String, partSpec: Seq[PartField],
                               requiredCols: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StagedInputPartition]
    new StagedPartitionReader(p, schemaJson, partSpec, requiredCols)
  }
}

/** Streams this partition's files through the hand-rolled parquet
  * [[ReadSupport]]; identity partition columns are reconstituted from the
  * directory values as per-partition constants (they are not stored in the
  * files — same contract as the writer).
  */
class StagedPartitionReader(p: StagedInputPartition, schemaJson: String,
                            partSpec: Seq[PartField], requiredCols: Seq[String])
    extends PartitionReader[InternalRow] {

  private val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  private val identity = partSpec.filter(_.kind == "identity").map(_.name)
  // requested DATA fields (everything not reconstituted from the dir name)
  private val dataFields: Seq[StructField] =
    requiredCols.filterNot(identity.contains).map(n => schema(n))
  // output ordinal -> Left(constant) | Right(index into the data array)
  private val slots: Array[Either[Any, Int]] = requiredCols.map { n =>
    val pi = partSpec.indexWhere(pf => pf.kind == "identity" && pf.name == n)
    if (pi >= 0) Left(StagedScan.partValue(schema(n).dataType, p.rawValues(pi)))
    else Right(dataFields.indexWhere(_.name == n))
  }.toArray

  private val fileIter = p.files.iterator
  private var reader: ParquetReader[Array[Any]] = _
  private var current: Array[Any] = _
  // count-star / partition-columns-only scans project ZERO data columns;
  // parquet cannot decode an empty projection, so emit footer row counts
  private var pendingRows: Long = 0L

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (!fileIter.hasNext) false
    else if (dataFields.isEmpty) {
      val f = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new Path(fileIter.next()), new Configuration()))
      try pendingRows += f.getRecordCount finally f.close()
      true
    } else {
      reader = ParquetReader
        .builder(new FlatRowReadSupport(dataFields), new Path(fileIter.next()))
        .withConf(new Configuration())
        .build()
      true
    }
  }

  override def next(): Boolean = {
    if (dataFields.isEmpty) {
      while (pendingRows == 0L && fileIter.hasNext) openNext(): Unit
      if (pendingRows == 0L) return false
      pendingRows -= 1
      return true
    }
    while (true) {
      if (reader == null && !openNext()) return false
      val rec = reader.read()
      if (rec != null) { current = rec; return true }
      reader.close(); reader = null
    }
    false
  }

  override def get(): InternalRow =
    new GenericInternalRow(slots.map {
      case Left(const) => const
      case Right(i)    => current(i)
    })

  override def close(): Unit = if (reader != null) reader.close()
}

// ---------------------------------------------------------------------------
// parquet -> values, via public parquet-hadoop API only (read twin of
// InternalRowWriteSupport)
// ---------------------------------------------------------------------------

/** Materializes each record as an Array[Any] in `requested` order using
  * Spark internal value representations (UTF8String, epoch-day ints, UTC
  * micros, Decimal). Fields absent from the file (pre-evolution files)
  * stay null. Flat scalars only — the staged sink's nested encodings
  * read back through spark.read.parquet instead.
  */
private[v2] class FlatRowReadSupport(requested: Seq[StructField])
    extends ReadSupport[Array[Any]] {

  override def init(ctx: InitContext): ReadSupport.ReadContext = {
    val fileSchema = ctx.getFileSchema
    val present = requested.filter(f => fileSchema.containsField(f.name))
    val tps: java.util.List[org.apache.parquet.schema.Type] =
      present.map(f => fileSchema.getType(Seq(f.name): _*)).asJava
    new ReadSupport.ReadContext(new MessageType("spark_schema", tps))
  }

  override def prepareForRead(conf: Configuration,
                              keyValueMetaData: java.util.Map[String, String],
                              fileSchema: MessageType,
                              readContext: ReadSupport.ReadContext): RecordMaterializer[Array[Any]] = {
    val projected = readContext.getRequestedSchema
    // projected field i -> ordinal in the requested (output) array
    val target: Array[Int] = projected.getFields.asScala.toArray
      .map(t => requested.indexWhere(_.name == t.getName))
    val types: Array[DataType] = projected.getFields.asScala.toArray
      .map(t => requested(requested.indexWhere(_.name == t.getName)).dataType)
    new RecordMaterializer[Array[Any]] {
      private val row = new Array[Any](requested.length)

      private def conv(dt: DataType, out: Int): PrimitiveConverter = dt match {
        case BooleanType => new PrimitiveConverter {
          override def addBoolean(v: Boolean): Unit = row(out) = v }
        case IntegerType | DateType => new PrimitiveConverter {
          override def addInt(v: Int): Unit = row(out) = v }
        case LongType | TimestampType => new PrimitiveConverter {
          override def addLong(v: Long): Unit = row(out) = v }
        case FloatType => new PrimitiveConverter {
          override def addFloat(v: Float): Unit = row(out) = v }
        case DoubleType => new PrimitiveConverter {
          override def addDouble(v: Double): Unit = row(out) = v }
        case StringType => new PrimitiveConverter {
          override def addBinary(v: Binary): Unit =
            row(out) = UTF8String.fromBytes(v.getBytes) }
        case BinaryType => new PrimitiveConverter {
          override def addBinary(v: Binary): Unit = row(out) = v.getBytes }
        case d: DecimalType if d.precision <= 9 => new PrimitiveConverter {
          override def addInt(v: Int): Unit =
            row(out) = Decimal(v.toLong, d.precision, d.scale) }
        case d: DecimalType if d.precision <= 18 => new PrimitiveConverter {
          override def addLong(v: Long): Unit =
            row(out) = Decimal(v, d.precision, d.scale) }
        case other => throw new UnsupportedOperationException(
          s"staged scan: flat scalar read only, got $other " +
            "(nested tables read via StagedParquet.readTable)")
      }

      private val root: GroupConverter = new GroupConverter {
        private val convs: Array[Converter] =
          types.indices.map(i => conv(types(i), target(i)): Converter).toArray
        override def getConverter(i: Int): Converter = convs(i)
        override def start(): Unit = java.util.Arrays.fill(
          row.asInstanceOf[Array[AnyRef]], null)
        override def end(): Unit = ()
      }

      override def getCurrentRecord: Array[Any] = row.clone()
      override def getRootConverter: GroupConverter = root
    }
  }
}
