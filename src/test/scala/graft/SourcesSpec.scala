package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{PagedRecords, TableLifecycle}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val page1 =
    """{"current_page": 1, "total_pages": 2, "records": [
       {"name": "alice", "phone": {"full": "215-555-0001"},
        "links": [{"id": "a1"}, {"id": "b2"}],
        "seen": {"timestamp": "3/14/2024 9:30 AM"}},
       {"name": "bob", "phone": {"full": "215-555-0002"},
        "links": [], "seen": {"timestamp": "12/1/2023 11:05 PM"}}]}"""
  private val page2 =
    """{"current_page": 2, "total_pages": 2, "records": [
       {"name": "carol", "phone": {"full": "215-555-0003"},
        "links": [{"id": "c3"}], "seen": {"timestamp": "1/2/2024 12:00 PM"}}]}"""

  test("paged records explode with stable in-page ordering") {
    val pages = Seq((1, page1), (2, page2)).toDF("page_no", "body")
    val recs = PagedRecords.explodeRecords(pages, "body")
    assert(recs.count() == 3)
    val withId = PagedRecords.addSequentialObjectId(recs,
      "page_no", "record_idx")
    val names = withId.orderBy("objectid")
      .select(get_json_object(col("record_json"), "$.name")).as[String].collect()
    assert(names.toSeq == Seq("alice", "bob", "carol"))
  }

  test("knack-style type coercions: connection, phone, date_time") {
    val pages = Seq((1, page1)).toDF("page_no", "body")
    val recs = PagedRecords.explodeRecords(pages, "body")
    val out = recs.select(
      PagedRecords.coerceConnection(col("record_json"), "links").as("links"),
      PagedRecords.coercePhone(col("record_json"), "phone").as("phone"),
      PagedRecords.coerceDateTime(col("record_json"), "seen").as("seen"))
      .orderBy("phone").collect()
    assert(out(0).getString(0) == """["a1","b2"]""")
    assert(out(0).getString(1) == "215-555-0001")
    assert(out(0).getString(2) == "2024-03-14T09:30:00Z")
    assert(out(1).getString(2) == "2023-12-01T23:05:00Z")
  }

  test("malformed pages surface as null records instead of vanishing") {
    val pages = Seq((1, page1), (2, "{\"oops\": true}"), (3, "not json"))
      .toDF("page_no", "body")
    val recs = PagedRecords.explodeRecords(pages, "body")
    assert(recs.count() == 4) // 2 real records + 2 null-marker rows
    assert(recs.filter(col("record_json").isNull).count() == 2)
  }

  test("truncate-and-load replaces table contents") {
    val path = "/tmp/graft_tbl_truncate"
    TableLifecycle.truncateAndLoad(spark.range(10).toDF("id"), path)
    assert(spark.read.parquet(path).count() == 10)
    TableLifecycle.truncateAndLoad(spark.range(3).toDF("id"), path)
    assert(spark.read.parquet(path).count() == 3)
  }

  test("rename-replace swaps atomically and cleans up") {
    val path = "/tmp/graft_tbl_swap"
    TableLifecycle.renameReplace(spark.range(5).toDF("id"), path)
    assert(spark.read.parquet(path).count() == 5)
    val n = TableLifecycle.renameReplace(spark.range(8).toDF("id"), path,
      expectRows = Some(8))
    assert(n == 8 && spark.read.parquet(path).count() == 8)
    // no leftover staging/old dirs
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__staging")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__old")))
  }

  test("rename-replace aborts on count mismatch, prod untouched") {
    val path = "/tmp/graft_tbl_abort"
    TableLifecycle.renameReplace(spark.range(5).toDF("id"), path)
    intercept[IllegalStateException] {
      TableLifecycle.renameReplace(spark.range(9).toDF("id"), path,
        expectRows = Some(999))
    }
    assert(spark.read.parquet(path).count() == 5, "prod must be untouched")
  }
}
