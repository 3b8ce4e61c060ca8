package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.EtlOps
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Cleaning CSV source, re-expressing the reference's csv ingest semantics
  * (databridge-etl-tools):
  *  - utf-8 → latin-1 read fallback         (postgres.py:292-298)
  *  - BOM strip from the header             (postgres.py:723-728)
  *  - NUL-byte removal in string columns    (_cleanup.py:40-66)
  *  - header sanitation                     (postgres.py:400-418)
  *  - JSON-schema → typed columns           (postgres.py:449-559 +
  *                                           postgres_map.py DATA_TYPE_MAP)
  *
  * Everything is a distributed read + declarative projection: encoding
  * detection samples only the head of the file; cleaning/casting are column
  * expressions applied inside the scan's projection — no driver-side file
  * loads, so the source scales to any file set.
  */
object CleanCsv {

  /** Reference DATA_TYPE_MAP (postgres types) re-targeted at Spark types. */
  val typeMap: Map[String, String] = Map(
    "string" -> "string", "text" -> "string",
    "number" -> "decimal(38,8)", "numeric" -> "decimal(38,8)",
    "float" -> "double", "double precision" -> "double",
    "integer" -> "int", "boolean" -> "boolean",
    "object" -> "string", "array" -> "string",
    "date" -> "date", "time" -> "string",
    "datetime" -> "timestamp", "timestamp" -> "timestamp",
    "timestamp without time zone" -> "timestamp",
    "timestamp with time zone" -> "timestamp",
    "geom" -> "string", "geometry" -> "string")

  /** The reference's three sink-specific DATA_TYPE_MAPs, verbatim
    * (JSON-schema type → target DDL type) — for emitting
    * reference-identical CREATE TABLE column types per sink. They differ
    * only in temporal targets:
    *  - postgres (postgres/postgres_map.py:1-17): tz kept as declared
    *  - carto (carto/carto_.py:25-43): every timestamp forced tz-aware
    *  - abstract/legacy (abstract/__init__.py:11-25): datetime collapses
    *    to date, no timestamp keys
    */
  val postgresDdlMap: Map[String, String] = Map(
    "string" -> "text", "number" -> "numeric", "float" -> "numeric",
    "double precision" -> "numeric", "integer" -> "integer",
    "boolean" -> "boolean", "object" -> "jsonb", "array" -> "jsonb",
    "date" -> "date", "time" -> "time",
    "datetime" -> "timestamp without time zone",
    "timestamp without time zone" -> "timestamp without time zone",
    "timestamp with time zone" -> "timestamp with time zone",
    "geom" -> "geometry", "geometry" -> "geometry")

  val cartoDdlMap: Map[String, String] = Map(
    "string" -> "text", "number" -> "numeric", "float" -> "numeric",
    "double precision" -> "numeric", "integer" -> "integer",
    "boolean" -> "boolean", "object" -> "jsonb", "array" -> "jsonb",
    "date" -> "date", "time" -> "time",
    "datetime" -> "timestamp with time zone",
    "timestamp" -> "timestamp with time zone",
    "timestamp without time zone" -> "timestamp with time zone",
    "geom" -> "geometry", "geometry" -> "geometry")

  val abstractDdlMap: Map[String, String] = Map(
    "string" -> "text", "number" -> "numeric", "float" -> "numeric",
    "double precision" -> "numeric", "integer" -> "integer",
    "boolean" -> "boolean", "object" -> "jsonb", "array" -> "jsonb",
    "date" -> "date", "time" -> "time", "datetime" -> "date",
    "geom" -> "geometry", "geometry" -> "geometry")

  /** GEOM_TYPE_MAP (postgres_map.py:19-27): declared geometry class →
    * stored class. polygon/line promote to their MULTI class — the DDL-side
    * twin of [[graft.functions.GeomFunctions.promoteMulti]], which performs
    * the matching promotion on the WKT values.
    */
  val geomTypeMap: Map[String, String] = Map(
    "point" -> "Point", "line" -> "Linestring", "linestring" -> "Linestring",
    "polygon" -> "MultiPolygon", "multipolygon" -> "MultiPolygon",
    "multilinestring" -> "MultiLineString", "geometry" -> "Geometry")

  /** Parse the reference's JSON schema document
    * (`[{"name": ..., "type": ...}, ...]` or `{"fields": [...]}`) into
    * (column → spark type) pairs, preserving order.
    */
  def schemaFromJson(json: String): Seq[(String, String)] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    val fields = if (root.isArray) root else root.get("fields")
    fields.elements().asScala.map { f =>
      val name = f.get("name").asText()
      val typ = typeMap.getOrElse(f.get("type").asText().toLowerCase, "string")
      name -> typ
    }.toSeq
  }

  /** Sniff the encoding from the head of the file: Spark passes raw bytes
    * through on UTF-8 reads, so invalid sequences survive — `is_valid_utf8`
    * flags them distributedly. Any invalid line in the first `sample` lines
    * → fall back to ISO-8859-1 (which maps every byte), mirroring the
    * reference's utf-8 → latin-1 retry.
    */
  def detectEncoding(spark: SparkSession, path: String, sample: Int = 500): String = {
    val headIsCleanUtf8 = spark.read.text(path)
      .limit(sample)
      .filter(!expr("is_valid_utf8(value)"))
      .isEmpty
    if (headIsCleanUtf8) "UTF-8" else "ISO-8859-1"
  }

  /** Read a CSV with full reference cleaning. `jsonSchema` (optional) types
    * the columns after header sanitation.
    */
  def read(spark: SparkSession, path: String,
           jsonSchema: Option[String] = None,
           encoding: Option[String] = None): DataFrame = {
    val enc = encoding.getOrElse(detectEncoding(spark, path))
    val raw = spark.read
      .option("header", "true")
      .option("encoding", enc)
      .option("mode", "PERMISSIVE")
      .csv(path)
    val sane = EtlOps.sanitizeHeader(raw)
    val cleaned0 = EtlOps.cleanNullBytes(sane,
      sane.schema.fields.filter(_.dataType.typeName == "string").map(_.name).toSeq)
    // drop ALL-NULL rows (sharepoint.py:124-125: an xlsx sheet's trailing
    // blank rows arrive as rows of Nones and are removed before the CSV
    // lands; a blank CSV line parses the same way here) — one codegen'd
    // disjunction, no extra pass
    val cleaned = cleaned0.filter(
      cleaned0.columns.map(c => col(c).isNotNull).reduce(_ || _))
    jsonSchema match {
      case Some(js) =>
        // schema names go through the same sanitation as the CSV header, so
        // matching is consistent (castColumns matches case-SENSITIVELY while
        // column resolution is case-insensitive — without this, a cased
        // schema name would silently skip its cast yet still resolve)
        val types = schemaFromJson(js).map { case (n, t) =>
          n.trim.toLowerCase.replace("#", "_") -> t
        }
        val typed = EtlOps.castColumns(cleaned, types.toMap)
        // project to the schema's column order (ingest contract); a schema
        // column absent from the CSV fails loudly here, like the
        // reference's COPY into the schema-created table would
        typed.select(types.map(t => col(t._1)): _*)
      case None => cleaned
    }
  }
}
