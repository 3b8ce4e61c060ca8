package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for the staged-table maintenance verbs — the
  * lifecycle operations DELETE/UPDATE/MERGE already reach through SQL now
  * have procedure twins (Iceberg's `CALL catalog.system.*` shape, via
  * Spark 4's V2 ProcedureCatalog):
  *
  *   CALL graft_staged.system.compact('ns.table' [, target_bytes, min_files])
  *   CALL graft_staged.system.evolve_partitioning('ns.table', 'bucket(8,key)')
  *   CALL graft_staged.system.migrate_layouts('ns.table')
  *   CALL graft_staged.system.vacuum('ns.table' [, min_age_ms, version_retain_ms])
  *   CALL graft_staged.system.create_tag('ns.table', 'name' [, version])
  *   CALL graft_staged.system.drop_tag('ns.table', 'name')
  *   CALL graft_staged.system.publish_appends('ns.audit', 'ns.table')
  *   CALL graft_staged.system.rollback_to_version('ns.table', v)
  *
  * Each returns its library twin's report as a result set (LocalScan), so
  * a SQL-only operator can run — and audit — the whole maintenance cycle
  * without a JVM entry point. The partition-spec grammar matches the
  * write-side transforms: comma-separated `col` (identity), `days(col)`,
  * `bucket(n,col)`; '' = unpartitioned.
  */
object StagedProcedures {

  val names: Seq[String] =
    Seq("compact", "evolve_partitioning", "migrate_layouts", "vacuum",
      "create_tag", "drop_tag", "publish_appends", "rollback_to_version")

  def load(name: String): Option[UnboundProcedure] = name match {
    case "compact"             => Some(CompactProcedure)
    case "evolve_partitioning" => Some(EvolveProcedure)
    case "migrate_layouts"     => Some(MigrateProcedure)
    case "vacuum"              => Some(VacuumProcedure)
    case "create_tag"          => Some(CreateTagProcedure)
    case "drop_tag"            => Some(DropTagProcedure)
    case "publish_appends"     => Some(PublishProcedure)
    case "rollback_to_version" => Some(RollbackProcedure)
    case _                     => None
  }

  /** `ns.table` or `catalog.ns.table` → the catalog-qualified name the
    * library verbs resolve.
    */
  private def qualify(t: String): String =
    if (t.startsWith(StagedParquet.CatalogName + ".")) t
    else s"${StagedParquet.CatalogName}.$t"

  /** Parse the transform grammar: `col`, `days(col)`, `bucket(n,col)`. */
  private[v2] def parseSpec(spec: String): Seq[PartField] = {
    val Bucket = """bucket\s*\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r
    val Days = """days\s*\(\s*([^)\s]+)\s*\)""".r
    // split on TOP-LEVEL commas only — bucket(4,id) keeps its inner comma
    spec.split(""",(?![^(]*\))""").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case Bucket(n, c) => PartField(c, "bucket", n.toInt)
      case Days(c)      => PartField(c, "days")
      case c if c.matches("[A-Za-z_][A-Za-z0-9_]*") => PartField(c, "identity")
      case other => throw new IllegalArgumentException(
        s"evolve_partitioning: cannot parse transform '$other' " +
          "(grammar: col | days(col) | bucket(n,col))")
    }
  }

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** One-result-set bound procedure over a prepared row list. */
  private abstract class GraftProcedure(procName: String,
      params: Seq[ProcedureParameter], resultSchema: StructType)
      extends UnboundProcedure with BoundProcedure {
    def run(s: SparkSession, input: InternalRow): Seq[InternalRow]
    override def name(): String = procName
    override def description(): String = s"graft staged maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val out = run(SparkSession.active, input).toArray
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = resultSchema
      }).iterator()
    }
  }

  private object CompactProcedure extends GraftProcedure("compact",
    Seq(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("target_bytes", LongType)
        .defaultValue((128L * 1024 * 1024).toString).build(),
      ProcedureParameter.in("min_files", IntegerType).defaultValue("2").build()),
    StructType(Seq(
      StructField("dir", StringType), StructField("files_before", LongType),
      StructField("files_after", LongType), StructField("bytes", LongType)))) {
    override def run(s: SparkSession, in: InternalRow): Seq[InternalRow] =
      StagedParquet.compact(s, qualify(in.getUTF8String(0).toString),
          in.getLong(1), in.getInt(2))
        .map { case (dir, nb, na, bytes) => new GenericInternalRow(
          Array[Any](utf8(dir), nb, na, bytes)) }
  }

  private object EvolveProcedure extends GraftProcedure("evolve_partitioning",
    Seq(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("spec", StringType).build()),
    StructType(Seq(StructField("generation", LongType)))) {
    override def run(s: SparkSession, in: InternalRow): Seq[InternalRow] = {
      val gid = StagedParquet.evolvePartitioning(s,
        qualify(in.getUTF8String(0).toString),
        parseSpec(in.getUTF8String(1).toString))
      Seq(new GenericInternalRow(Array[Any](gid)))
    }
  }

  private object MigrateProcedure extends GraftProcedure("migrate_layouts",
    Seq(ProcedureParameter.in("table", StringType).build()),
    StructType(Seq(
      StructField("generation", StringType),
      StructField("rows_migrated", LongType)))) {
    override def run(s: SparkSession, in: InternalRow): Seq[InternalRow] =
      StagedParquet.migrateLayouts(s, qualify(in.getUTF8String(0).toString))
        .map { case (g, n) => new GenericInternalRow(Array[Any](utf8(g), n)) }
  }

  /** CALL graft_staged.system.create_tag('ns.t', 'name' [, version]) —
    * an immutable named snapshot (readable as VERSION AS OF 'name';
    * vacuum never prunes what a tag still needs). version defaults to
    * the table's current version (-1 sentinel = current).
    */
  private object CreateTagProcedure extends GraftProcedure("create_tag",
    Seq(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("name", StringType).build(),
      ProcedureParameter.in("version", LongType).defaultValue("-1").build()),
    StructType(Seq(
      StructField("name", StringType), StructField("version", LongType)))) {
    override def run(s: SparkSession, in: InternalRow): Seq[InternalRow] = {
      val n = in.getUTF8String(1).toString
      val v0 = in.getLong(2)
      val v = StagedParquet.createTag(s, qualify(in.getUTF8String(0).toString),
        n, if (v0 < 0) None else Some(v0))
      Seq(new GenericInternalRow(Array[Any](utf8(n), v)))
    }
  }

  private object DropTagProcedure extends GraftProcedure("drop_tag",
    Seq(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("name", StringType).build()),
    StructType(Seq(StructField("dropped", BooleanType)))) {
    override def run(s: SparkSession, in: InternalRow): Seq[InternalRow] =
      Seq(new GenericInternalRow(Array[Any](StagedParquet.dropTag(s,
        qualify(in.getUTF8String(0).toString), in.getUTF8String(1).toString))))
  }

  /** CALL graft_staged.system.publish_appends('ns.audit', 'ns.dst') —
    * write-audit-publish: every data file of the audit table renames
    * into dst as ONE append commit (zero bytes copied), the audit table
    * drops. Crash-resumable via the intent file; see
    * [[StagedParquet.publishAppends]].
    */
  private object PublishProcedure extends GraftProcedure("publish_appends",
    Seq(
      ProcedureParameter.in("source", StringType).build(),
      ProcedureParameter.in("target", StringType).build()),
    StructType(Seq(
      StructField("files_published", LongType),
      StructField("bytes_published", LongType)))) {
    override def run(s: SparkSession, in: InternalRow): Seq[InternalRow] = {
      val (nf, nb) = StagedParquet.publishAppends(s,
        qualify(in.getUTF8String(0).toString),
        qualify(in.getUTF8String(1).toString))
      Seq(new GenericInternalRow(Array[Any](nf, nb)))
    }
  }

  /** CALL graft_staged.system.rollback_to_version('ns.t', v) — restore
    * version v as the NEW current state (a normal versioned REPLACE:
    * pre-rollback versions stay time-travelable; a tag name resolves
    * through VERSION AS OF first if preferred). Distributed rewrite of
    * the restored bytes — see [[StagedParquet.rollbackToVersion]].
    */
  private object RollbackProcedure extends GraftProcedure("rollback_to_version",
    Seq(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("version", LongType).build()),
    StructType(Seq(
      StructField("restored_version", LongType),
      StructField("new_version", LongType)))) {
    override def run(s: SparkSession, in: InternalRow): Seq[InternalRow] = {
      val v = in.getLong(1)
      val nv = StagedParquet.rollbackToVersion(s,
        qualify(in.getUTF8String(0).toString), v)
      Seq(new GenericInternalRow(Array[Any](v, nv)))
    }
  }

  private object VacuumProcedure extends GraftProcedure("vacuum",
    Seq(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("min_age_ms", LongType)
        .defaultValue("3600000").build(),
      ProcedureParameter.in("version_retain_ms", LongType)
        .defaultValue((7L * 24 * 3600 * 1000).toString).build()),
    StructType(Seq(
      StructField("path", StringType), StructField("kind", StringType)))) {
    override def run(s: SparkSession, in: InternalRow): Seq[InternalRow] =
      StagedParquet.vacuum(s, qualify(in.getUTF8String(0).toString),
          in.getLong(1), in.getLong(2))
        .map { case (p, k) => new GenericInternalRow(
          Array[Any](utf8(p), utf8(k))) }
  }
}
