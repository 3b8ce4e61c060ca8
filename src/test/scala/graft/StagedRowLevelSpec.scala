package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL row-level operations on staged tables — UPDATE / MERGE INTO /
  * non-metadata DELETE through
  * [[graft.sources.v2.StagedRowLevelOperation]] (group-based
  * copy-on-write, group = partition directory). Contracts under test:
  * UPDATE rewrites only the directories the runtime group filter could
  * not close (others byte-identical); MERGE updates matched rows, inserts
  * unmatched ones, and byte-copies the history of insert-only
  * directories; a DELETE whose predicate the metadata tiers cannot
  * express executes through the rewrite instead of failing; a
  * metadata-expressible DELETE still takes the tiered path (pinned by
  * file identity in StagedDeleteSpec).
  */
class StagedRowLevelSpec extends AnyFunSuite {
  private lazy val spark = { graft.sources.v2.StagedParquet.ensureCatalog(TestSpark.spark); TestSpark.spark }
  private def tbl(t: String) = s"graft_staged.rowlevel.$t"
  import graft.sources.v2.StagedParquet

  private def dataFiles(dir: String): Map[String, Long] = {
    val d = new java.io.File(dir)
    if (!d.exists) Map.empty
    else d.listFiles.toSeq.filter(f => f.isFile &&
      f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(f => f.getName -> f.length).toMap
  }

  test("SQL UPDATE rewrites only the runtime-filtered partition dirs") {
    import spark.implicits._
    val t = tbl("u1")
    (0L until 300L).map(i => (i % 3, i, 1.0)).toDF("k", "id", "w")
      .writeTo(t).partitionedBy(col("k")).createOrReplace()
    val dir = StagedParquet.tableDir(spark, t)
    val keep0 = dataFiles(s"$dir/k=0"); val keep2 = dataFiles(s"$dir/k=2")
    spark.sql(s"UPDATE $t SET w = w * 5.0 WHERE k = 1 AND id >= 150")
    // group filter closed k=0 and k=2 — identical files, never rewritten
    assert(dataFiles(s"$dir/k=0") == keep0, "k=0 must not be rewritten")
    assert(dataFiles(s"$dir/k=2") == keep2, "k=2 must not be rewritten")
    val rows = spark.table(t).collect()
    assert(rows.length == 300)
    assert(rows.forall { r =>
      val (k, id, w) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      if (k == 1L && id >= 150L) w == 5.0 else w == 1.0
    })
  }

  test("SQL UPDATE with NULL-condition semantics on an unpartitioned table") {
    import spark.implicits._
    val t = tbl("u2")
    (0L until 100L).map(i => (i, if (i % 10 == 0) None else Some(i * 1.0)))
      .toDF("id", "score")
      .writeTo(t).createOrReplace()
    spark.sql(s"UPDATE $t SET score = 0.0 WHERE score > 49.5")
    val rows = spark.table(t).orderBy("id").collect()
    assert(rows.length == 100, "UPDATE never changes row count")
    // NULL condition leaves the row unchanged
    assert((0L until 100L by 10L).forall(i =>
      rows.exists(r => r.getLong(0) == i && r.isNullAt(1))))
    assert(rows.forall { r =>
      if (r.isNullAt(1)) true
      else if (r.getLong(0) > 49L && r.getLong(0) % 10 != 0) r.getDouble(1) == 0.0
      else r.getDouble(1) == r.getLong(0) * 1.0
    })
  }

  test("MERGE INTO: matched rows update, unmatched insert, insert-only dirs keep history") {
    import spark.implicits._
    val t = tbl("m1")
    // k=0 and k=1 exist; the source updates part of k=0 and inserts into
    // k=2 (new dir) AND k=1 (existing dir the ON condition never matches)
    (0L until 100L).map(i => (i % 2, i, 10.0)).toDF("k", "id", "v")
      .writeTo(t).partitionedBy(col("k")).createOrReplace()
    val dir = StagedParquet.tableDir(spark, t)
    Seq((0L, 0L, 99.0), (0L, 2L, 98.0),   // matched: update
        (2L, 1000L, 1.0), (2L, 1001L, 2.0), // new dir
        (1L, 2000L, 3.0))                   // insert into existing dir
      .toDF("k", "id", "v").createOrReplaceTempView("m1_src")
    spark.sql(
      s"""MERGE INTO $t AS t USING m1_src AS s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN NOT MATCHED THEN INSERT (k, id, v) VALUES (s.k, s.id, s.v)""")
    val rows = spark.table(t).collect()
    assert(rows.length == 103, s"100 + 3 inserts, got ${rows.length}")
    assert(spark.table(t).filter($"id" === 0L).select($"v").as[Double].head() == 99.0)
    assert(spark.table(t).filter($"id" === 2L).select($"v").as[Double].head() == 98.0)
    assert(spark.table(t).filter($"k" === 2L).count() == 2L)
    // the insert into k=1 (or a group-filtered MERGE that never scanned
    // k=1) must not lose k=1's 50 historical rows
    assert(spark.table(t).filter($"k" === 1L).count() == 51L)
    assert(spark.table(t).filter($"k" === 1L && $"v" === 10.0).count() == 50L)
    assert(new java.io.File(s"$dir/k=2").isDirectory)
  }

  test("DELETE with a non-metadata predicate executes through the rewrite") {
    import spark.implicits._
    val t = tbl("d1")
    (0L until 60L).map(i => (i % 3, i, s"name$i")).toDF("k", "id", "name")
      .writeTo(t).partitionedBy(col("k")).createOrReplace()
    // LIKE is not a tier-expressible shape — previously rejected, now COW
    spark.sql(s"DELETE FROM $t WHERE name LIKE 'name1%'")
    val left = spark.table(t).collect()
    // deleted: 1, 10..19 -> 11 rows
    assert(left.length == 49, s"expected 49 rows, got ${left.length}")
    assert(left.forall(r => !r.getString(2).startsWith("name1")))
  }

  test("row-level UPDATE may move rows across partition directories") {
    import spark.implicits._
    val t = tbl("u3")
    (0L until 40L).map(i => (i % 2, i)).toDF("k", "id")
      .writeTo(t).partitionedBy(col("k")).createOrReplace()
    // the library updateWhere rejects partition-column SET; SQL UPDATE
    // through the group rewrite handles the move (rows re-route to their
    // new directory at the staged write)
    spark.sql(s"UPDATE $t SET k = 5 WHERE id < 4")
    assert(spark.table(t).count() == 40L)
    assert(spark.table(t).filter($"k" === 5L).count() == 4L)
    assert(spark.table(t).filter($"k" === 0L || $"k" === 1L).count() == 36L)
    val dir = StagedParquet.tableDir(spark, t)
    assert(new java.io.File(s"$dir/k=5").isDirectory)
  }
}
