package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Ingest

class IngestQuerySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("etl_csv_ingest: BOM/#/NUL dirt cancels out; é and types survive") {
    val out = Ingest.queries("etl_csv_ingest")(spark, sf)
    assert(out.schema.map(f => f.name -> f.dataType.simpleString) ==
      Seq("nation_key" -> "int", "n_name" -> "string", "region_key" -> "int"))
    val rows = out.collect()
    assert(rows.length == 25)
    assert(rows.forall(r => !r.getString(1).contains("\u0000")))
    assert(rows.filter(_.getInt(0) % 5 == 0).forall(_.getString(1).endsWith("é")))
    assert(rows.filter(r => r.getInt(0) % 5 != 0).forall(!_.getString(1).endsWith("é")))
  }

  test("etl_paged_coerce: objectid is dense 1..N in custkey order") {
    val rows = Ingest.queries("etl_paged_coerce")(spark, sf)
      .select("objectid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    // knack date_time coercion emits ISO-8601+Z
    val ts = Ingest.queries("etl_paged_coerce")(spark, sf)
      .select("event_ts").limit(3).collect().map(_.getString(0))
    assert(ts.forall(_.matches("""2020-\d{2}-\d{2}T\d{2}:\d{2}:00Z""")))
  }
}
