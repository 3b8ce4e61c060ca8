package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.functions.GeomFunctions._

/** Geometry (WKT) operator queries (SURVEY.md §2 "Geometry").
  *
  * The testdata has no geometry column, so each query synthesizes WKT
  * deterministically from integer keys — integer coordinates only, so the
  * Spark and DuckDB string renderings are identical and the oracle compare
  * is exact. All geometry logic is `GeomFunctions` column math (codegen).
  */
object Geom {

  // Deterministic integer "coordinates" derived from the customer key.
  private def xi(c: Column): Column = (c * 7919L)   % 1000000L + 2400000L
  private def yi(c: Column): Column = (c * 104729L) % 300000L  + 200000L
  private def zi(c: Column): Column = c % 100L

  private def str(c: Column): Column = c.cast("string")

  // LINESTRING Z with two points → force_2d strips the Z label + values.
  def forceTwoD(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val k = c("c_custkey")
    val wkt = concat(lit("LINESTRING Z ("),
      str(xi(k)), lit(" "), str(yi(k)), lit(" "), str(zi(k)), lit(", "),
      str(xi(k) + 10L), lit(" "), str(yi(k) + 10L), lit(" "), str(zi(k)), lit(")"))
    c.select(k.as("id"), force2d(wkt).as("wkt_2d")).orderBy("id")
  }

  // Even keys get POLYGON (promoted), odd keys are already MULTIPOLYGON.
  def promoteMultiQ(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val k = c("c_custkey")
    val ring = concat(str(xi(k)), lit(" "), str(yi(k)), lit(", "),
      str(xi(k) + 20L), lit(" "), str(yi(k)), lit(", "),
      str(xi(k)), lit(" "), str(yi(k) + 20L), lit(", "),
      str(xi(k)), lit(" "), str(yi(k)))
    val wkt = when(k % 2 === 0, concat(lit("POLYGON (("), ring, lit("))")))
      .otherwise(concat(lit("MULTIPOLYGON ((("), ring, lit(")))")))
    c.select(k.as("id"), promoteMulti(wkt).as("wkt_multi"),
        geomTypeOf(promoteMulti(wkt)).as("geom_type"))
      .orderBy("id")
  }

  // `SRID=n;WKT` split: srid, type, bare wkt.
  def stripSrid(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val k = c("c_custkey")
    val ewkt = concat(lit("SRID="), str((k % 2) * 2054L + 2272L), lit(";POINT ("),
      str(xi(k)), lit(" "), str(yi(k)), lit(")"))
    c.select(k.as("id"), sridOf(ewkt).as("srid"),
        geomTypeOf(wktOf(ewkt)).as("geom_type"), wktOf(ewkt).as("wkt"))
      .orderBy("id")
  }

  // POINT lon/lat extraction (scaled-integer coords → exact doubles).
  def pointLatLng(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val k = c("c_custkey")
    val lonI = (k * 7919L)   % 3600000L  // 0..3599999 → -180..180 by /1e4
    val latI = (k * 104729L) % 1600000L  // 0..1599999 → -80..80
    val wkt = concat(lit("POINT ("),
      str(lonI), lit(" "), str(latI), lit(")"))
    c.select(k.as("id"),
        (pointX(wkt) / 10000.0 - 180.0).as("lng"),
        (pointY(wkt) / 10000.0 - 80.0).as("lat"))
      .orderBy("id")
  }

  // 4326 → 3857 web-mercator projection, rounded to 0.1 m for libm parity.
  def reprojectMerc(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val k = c("c_custkey")
    val lon = ((k * 7919L)   % 3600000L).cast("double") / 10000.0 - 180.0
    val lat = ((k * 104729L) % 1600000L).cast("double") / 10000.0 - 80.0
    c.select(k.as("id"),
        round(mercX(lon), 1).as("merc_x"),
        round(mercY(lat), 1).as("merc_y"))
      .orderBy("id")
  }

  // EPSG:2272 state-plane (ftUS) → lon/lat. Oracle: the same LCC 2SP
  // inverse arithmetic mirrored as a DuckDB CTE chain (GeomSpec additionally
  // anchors the math itself via the origin identity + forward round-trip).
  def reprojectStatePlane(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val k = c("c_custkey")
    val (lon, lat) = lccInverse2272(xi(k).cast("double"), yi(k).cast("double"))
    c.select(k.as("id"),
        graft.core.Determinism.r6(lon).as("lng"),
        graft.core.Determinism.r6(lat).as("lat"))
      .orderBy("id")
  }

  // Bad-SRID lookup remap over the reference's correction table.
  private val bads = badSridMap.keys.toSeq.sorted
  def badSridRemapQ(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val k = c("c_custkey")
    val srid = bads.zipWithIndex.foldLeft(lit(bads.head): Column) {
      case (acc, (v, i)) => when(k % bads.size === i, lit(v)).otherwise(acc)
    }
    c.select(k.as("id"), srid.as("src_srid"), remapBadSrid(srid).as("srid"))
      .orderBy("id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geom_force_2d"       -> (forceTwoD _),
    "geom_promote_multi"  -> (promoteMultiQ _),
    "geom_strip_srid"     -> (stripSrid _),
    "geom_point_latlng"   -> (pointLatLng _),
    "geom_reproject_merc" -> (reprojectMerc _),
    "geom_reproject_sp"   -> (reprojectStatePlane _),
    "geom_bad_srid_remap" -> (badSridRemapQ _)
  )

  private val xiSql = "((c_custkey * 7919) % 1000000 + 2400000)"
  private val yiSql = "((c_custkey * 104729) % 300000 + 200000)"
  private val ziSql = "(c_custkey % 100)"

  val oracles: Map[String, String] = Map(
    "geom_force_2d" ->
      s"""WITH src AS (SELECT c_custkey AS id,
           'LINESTRING Z (' || $xiSql || ' ' || $yiSql || ' ' || $ziSql || ', '
             || ($xiSql + 10) || ' ' || ($yiSql + 10) || ' ' || $ziSql || ')' AS wkt
         FROM customer)
         SELECT id, regexp_replace(
           regexp_replace(wkt, '(\\w+)( ZM?| Z| M)?\\s*\\(', '\\1(', 'g'),
           '(-?\\d+\\.?\\d*)\\s+(-?\\d+\\.?\\d*)(\\s+(-?\\d+\\.?\\d*|NaN)(\\s+(-?\\d+\\.?\\d*|NaN)?)?)?',
           '\\1 \\2', 'g') AS wkt_2d
         FROM src ORDER BY id""",
    "geom_promote_multi" ->
      s"""WITH src AS (SELECT c_custkey AS id,
           $xiSql || ' ' || $yiSql || ', ' || ($xiSql + 20) || ' ' || $yiSql || ', '
             || $xiSql || ' ' || ($yiSql + 20) || ', ' || $xiSql || ' ' || $yiSql AS ring,
           c_custkey % 2 = 0 AS is_poly
         FROM customer),
         built AS (SELECT id,
           CASE WHEN is_poly THEN 'POLYGON ((' || ring || '))'
                ELSE 'MULTIPOLYGON (((' || ring || ')))' END AS wkt FROM src),
         promoted AS (SELECT id,
           CASE WHEN regexp_matches(wkt, '^(POLYGON|LINESTRING)\\b')
                THEN regexp_replace(wkt, '^(POLYGON|LINESTRING)( ZM| Z| M)?',
                                    'MULTI\\1\\2 (') || ')'
                ELSE wkt END AS wkt_multi FROM built)
         SELECT id, wkt_multi,
           trim(regexp_extract(wkt_multi, '^\\s*([A-Z]+)', 1)) AS geom_type
         FROM promoted ORDER BY id""",
    "geom_strip_srid" ->
      s"""WITH src AS (SELECT c_custkey AS id,
           'SRID=' || ((c_custkey % 2) * 2054 + 2272) || ';POINT ('
             || $xiSql || ' ' || $yiSql || ')' AS ewkt
         FROM customer)
         SELECT id,
           CAST(nullif(regexp_extract(ewkt, '^SRID=(\\d+);', 1), '') AS INTEGER) AS srid,
           trim(regexp_extract(regexp_replace(ewkt, '^SRID=\\d+;', ''), '^\\s*([A-Z]+)', 1)) AS geom_type,
           regexp_replace(ewkt, '^SRID=\\d+;', '') AS wkt
         FROM src ORDER BY id""",
    "geom_point_latlng" ->
      """WITH src AS (SELECT c_custkey AS id,
           'POINT (' || ((c_custkey * 7919) % 3600000) || ' '
             || ((c_custkey * 104729) % 1600000) || ')' AS wkt
         FROM customer)
         SELECT id,
           CAST(regexp_extract(wkt, 'POINT\s*\(\s*(-?\d+\.?\d*)\s+(-?\d+\.?\d*)', 1) AS DOUBLE) / 10000.0 - 180.0 AS lng,
           CAST(regexp_extract(wkt, 'POINT\s*\(\s*(-?\d+\.?\d*)\s+(-?\d+\.?\d*)', 2) AS DOUBLE) / 10000.0 - 80.0 AS lat
         FROM src ORDER BY id""",
    "geom_reproject_merc" ->
      """SELECT c_custkey AS id,
         round((((c_custkey * 7919) % 3600000) / 10000.0 - 180.0)
               * pi() * 6378137.0 / 180.0, 1) AS merc_x,
         round(ln(tan((90.0 + (((c_custkey * 104729) % 1600000) / 10000.0 - 80.0))
               * pi() / 360.0)) * 6378137.0, 1) AS merc_y
         FROM customer ORDER BY id""",
    "geom_reproject_sp" -> {
      val r6 = graft.core.Determinism.r6Sql _
      s"""WITH pts AS (SELECT c_custkey AS id,
            CAST($xiSql AS DOUBLE) AS xft, CAST($yiSql AS DOUBLE) AS yft
          FROM customer),
          ${graft.functions.GeomFunctions.lccInverse2272SqlCtes}
          SELECT id, ${r6("lng")} AS lng, ${r6("lat")} AS lat
          FROM lcc ORDER BY id"""
    },
    "geom_bad_srid_remap" -> {
      val cases = bads.zipWithIndex
        .map { case (v, i) => s"WHEN c_custkey % ${bads.size} = $i THEN $v" }
        .mkString(" ")
      val remap = badSridMap.toSeq.sorted
        .map { case (b, g) => s"WHEN src_srid = $b THEN $g" }.mkString(" ")
      s"""WITH src AS (SELECT c_custkey AS id,
            CASE $cases ELSE ${bads.head} END AS src_srid FROM customer)
          SELECT id, src_srid, CASE $remap ELSE src_srid END AS srid
          FROM src ORDER BY id"""
    }
  )
}
