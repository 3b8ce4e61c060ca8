package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot versioning / time travel on staged tables — every
  * visible-data commit claims a version, swapped-out directory states are
  * RETAINED under the sibling `<table>__meta/` tree, and
  * `SELECT ... FROM t VERSION AS OF n` reconstructs version n by undoing
  * the delta log newest-first ([[graft.sources.v2.StagedParquet]]).
  * Contracts under test: appends, DELETE (metadata tier and COW tier),
  * UPDATE, compaction and full REPLACE are all versioned; reconstruction
  * is exact at every intermediate version; vacuum prunes ONLY expired
  * retained trees (live data and newer versions untouched) and a
  * reconstruction past the pruned window fails loudly.
  */
class StagedTimeTravelSpec extends AnyFunSuite {
  private lazy val spark = { graft.sources.v2.StagedParquet.ensureCatalog(TestSpark.spark); TestSpark.spark }
  private def tbl(t: String) = s"graft_staged.timetravel.$t"
  import graft.sources.v2.StagedParquet

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    import spark.implicits._
    df.select($"id").as[Long].collect().sorted.toSeq
  }
  private def asOf(t: String, v: Long) =
    spark.sql(s"SELECT * FROM $t VERSION AS OF $v")
  // version history survives createOrReplace BY DESIGN (a replace is a
  // version); specs asserting absolute version numbers drop first
  private def fresh(t: String): Unit = spark.sql(s"DROP TABLE IF EXISTS $t")

  test("append → delete → update: every version reconstructs exactly") {
    import spark.implicits._
    val t = tbl("t1")
    fresh(t)
    // v1: create with 0..39 (k partitioned); v2: append 40..59
    (0L until 40L).map(i => (i % 4, i, 1.0)).toDF("k", "id", "w")
      .writeTo(t).partitionedBy(col("k")).createOrReplace()
    (40L until 60L).map(i => (i % 4, i, 1.0)).toDF("k", "id", "w")
      .writeTo(t).append()
    // v3: metadata-tier DELETE drops dir k=0
    spark.sql(s"DELETE FROM $t WHERE k = 0")
    // v4: COW delete of a band
    spark.sql(s"DELETE FROM $t WHERE id >= 50")
    // v5: SQL UPDATE (row-level rewrite)
    spark.sql(s"UPDATE $t SET w = 9.0 WHERE id < 10")
    val dir = StagedParquet.tableDir(spark, t)
    assert(StagedParquet.currentVersion(dir) == 5L)

    assert(ids(asOf(t, 1)) == (0L until 40L))
    assert(ids(asOf(t, 2)) == (0L until 60L))
    assert(ids(asOf(t, 3)) == (0L until 60L).filter(_ % 4 != 0))
    assert(ids(asOf(t, 4)) == (0L until 50L).filter(_ % 4 != 0))
    assert(ids(asOf(t, 5)) == (0L until 50L).filter(_ % 4 != 0))
    // v4 state has the pre-update w; v5 the updated one
    assert(asOf(t, 4).filter($"id" === 1L).select($"w").as[Double].head() == 1.0)
    assert(asOf(t, 5).filter($"id" === 1L).select($"w").as[Double].head() == 9.0)
    // current read unaffected
    assert(ids(spark.table(t)) == (0L until 50L).filter(_ % 4 != 0))
    // version 0 is the empty table; beyond-current versions are rejected
    assert(asOf(t, 0).count() == 0L)
    intercept[Exception](asOf(t, 99).collect())
  }

  test("a full REPLACE is one version; the old generation reads back whole") {
    import spark.implicits._
    val t = tbl("t2")
    fresh(t)
    (0L until 30L).map(i => (i, s"old$i")).toDF("id", "name")
      .writeTo(t).createOrReplace() // v1
    (100L until 110L).map(i => (i, i * 2)).toDF("id", "doubled")
      .writeTo(t).createOrReplace() // v2: new schema, new generation
    assert(ids(asOf(t, 1)) == (0L until 30L))
    assert(asOf(t, 1).schema.fieldNames.toSeq == Seq("id", "name"))
    assert(ids(asOf(t, 2)) == (100L until 110L))
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("id", "doubled"))
  }

  test("compaction is versioned: the pre-compaction file layout reads back") {
    import spark.implicits._
    val t = tbl("t3")
    fresh(t)
    (0L until 80L).map(i => (i, i * 1.5)).toDF("id", "v")
      .repartition(8)
      .writeTo(t).option("graft.write.distribute", "none").createOrReplace() // v1
    assert(StagedParquet.compact(spark, t).nonEmpty) // v2
    assert(ids(asOf(t, 1)) == (0L until 80L))
    assert(ids(asOf(t, 2)) == (0L until 80L))
    assert(ids(spark.table(t)) == (0L until 80L))
  }

  test("vacuum prunes expired retained trees only; newer versions stay readable") {
    import spark.implicits._
    val t = tbl("t4")
    fresh(t)
    (0L until 20L).map(i => (i, 1.0)).toDF("id", "v")
      .writeTo(t).createOrReplace()                    // v1
    spark.sql(s"DELETE FROM $t WHERE id >= 15")        // v2 (retains v1 state)
    val dir = StagedParquet.tableDir(spark, t)
    // age-0 retention expires every retained tree; live table + delta log stay
    val rep = StagedParquet.vacuum(spark, t, minAgeMs = 0L, versionRetainMs = 0L)
    assert(rep.exists(_._2 == "expired_version"), rep.toString)
    assert(ids(spark.table(t)) == (0L until 15L), "live data untouched")
    assert(StagedParquet.currentVersion(dir) == 2L, "delta log untouched")
    // the expired version fails loudly, it never silently serves wrong rows
    val e = intercept[Exception](asOf(t, 1).collect())
    assert(e.getMessage.contains("expired"), e.getMessage)
    // default retention (7 days) prunes nothing
    val t5 = tbl("t5")
    fresh(t5)
    (0L until 10L).map(i => (i, 1.0)).toDF("id", "v").writeTo(t5).createOrReplace()
    spark.sql(s"DELETE FROM $t5 WHERE id >= 5")
    assert(!StagedParquet.vacuum(spark, t5, minAgeMs = 0L)
      .exists(_._2 == "expired_version"))
    assert(ids(asOf(t5, 1)) == (0L until 10L))
  }
}
