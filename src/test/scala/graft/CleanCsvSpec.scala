package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import graft.sources.CleanCsv

class CleanCsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def write(path: String, bytes: Array[Byte]): String = {
    Files.write(Paths.get(path), bytes); path
  }

  test("BOM header + NUL bytes are cleaned on read") {
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    val body = "OBJECTID_1,Some#Name\n1,ab\u0000cd\n2,ok\n".getBytes("UTF-8")
    val p = write("/tmp/graft_bom.csv", bom ++ body)
    val df = CleanCsv.read(spark, p)
    assert(df.columns.toSeq == Seq("objectid", "some_name"))
    val vals = df.orderBy("objectid").collect().map(_.getString(1))
    assert(vals.toSeq == Seq("abcd", "ok"))
  }

  test("latin-1 fallback: non-utf8 bytes survive via ISO-8859-1") {
    // 0xE9 = é in latin-1, invalid as a standalone UTF-8 byte
    val body = ("name,city\n" + "René,Québec\n").getBytes("ISO-8859-1")
    val p = write("/tmp/graft_latin1.csv", body)
    assert(CleanCsv.detectEncoding(spark, p) == "ISO-8859-1")
    val df = CleanCsv.read(spark, p)
    assert(df.collect()(0).getString(0) == "René")
  }

  test("clean utf-8 stays utf-8") {
    val p = write("/tmp/graft_utf8.csv", "a,b\nx,y\n".getBytes("UTF-8"))
    assert(CleanCsv.detectEncoding(spark, p) == "UTF-8")
  }

  test("json schema drives typed columns in schema order") {
    val p = write("/tmp/graft_typed.csv",
      "id,price,seen,when\n1,9.5,true,2024-01-02 03:04:05\n".getBytes("UTF-8"))
    val js =
      """[{"name":"id","type":"integer"},
          {"name":"price","type":"number"},
          {"name":"seen","type":"boolean"},
          {"name":"when","type":"datetime"}]"""
    val df = CleanCsv.read(spark, p, jsonSchema = Some(js))
    assert(df.schema.map(f => f.name -> f.dataType.simpleString).toList ==
      List("id" -> "int", "price" -> "decimal(38,8)", "seen" -> "boolean",
        "when" -> "timestamp"))
    val r = df.collect()(0)
    assert(r.getInt(0) == 1 && r.getBoolean(2))
  }

  test("full DATA_TYPE_MAP round-trips: every DDL-map key has a Spark cast") {
    // every key of every sink DDL map must resolve through the Spark-target
    // typeMap (no JSON-schema type a reference pipeline can declare may
    // silently fall back to string) ...
    val allKeys = (CleanCsv.postgresDdlMap.keySet ++ CleanCsv.cartoDdlMap.keySet
      ++ CleanCsv.abstractDdlMap.keySet)
    assert(allKeys.subsetOf(CleanCsv.typeMap.keySet),
      s"unmapped: ${allKeys -- CleanCsv.typeMap.keySet}")
    // ... and every Spark target must be a real castable type
    import org.apache.spark.sql.functions._
    val df = spark.range(1)
    for (t <- CleanCsv.typeMap.values.toSet[String])
      df.select(lit(null).cast(t)).collect() // throws on an invalid type name
    // reference-pinned spot checks, one per divergent temporal rule
    assert(CleanCsv.postgresDdlMap("datetime") == "timestamp without time zone")
    assert(CleanCsv.cartoDdlMap("datetime") == "timestamp with time zone")
    assert(CleanCsv.abstractDdlMap("datetime") == "date")
    // geometry classes promote to MULTI, matching promoteMulti on values
    assert(CleanCsv.geomTypeMap("polygon") == "MultiPolygon")
    assert(CleanCsv.geomTypeMap("line") == "Linestring")
    assert(CleanCsv.geomTypeMap("multilinestring") == "MultiLineString")
  }

  test("schemaFromJson accepts the {fields:[...]} wrapper and unknown types") {
    val js = """{"fields":[{"name":"shape","type":"geometry"},
                           {"name":"x","type":"wat"}]}"""
    assert(CleanCsv.schemaFromJson(js) ==
      Seq("shape" -> "string", "x" -> "string"))
  }
}
