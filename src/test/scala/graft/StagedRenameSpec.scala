package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only RENAME COLUMN via field ids + alias name mapping
  * (r12 VERDICT #7 — the last ALTER TABLE gap). Contracts under test:
  *   - RENAME is one metadata commit: committed files byte-identical,
  *     pre-rename bytes read back through the alias, post-rename appends
  *     write the new name, and a THREE-generation table (pre-add null
  *     fill, pre-rename alias, native) reads exactly;
  *   - the field id is pinned and the alias recorded in `_schema.json`;
  *   - footer pruning consults aliases: a filter on the renamed column
  *     still zone-map-skips pre-rename files by their old-named stats
  *     (and never skips LIVE rows the way absent-column logic would);
  *   - COW rewrites coalesce aliases: an UPDATE touching pre-rename
  *     files cannot null the renamed column's history; compaction
  *     settles bytes to the current name;
  *   - the declared sort order follows the rename;
  *   - guards: partition-referenced rename rejected, collision with a
  *     live name/alias/tombstone rejected, rename under live equality
  *     deletes rejected (materialize first).
  */
class StagedRenameSpec extends AnyFunSuite {
  private lazy val spark = { graft.sources.v2.StagedParquet.ensureCatalog(TestSpark.spark); TestSpark.spark }
  private def tbl(t: String) = s"graft_staged.renamespec.$t"
  import graft.sources.v2.StagedParquet

  test("three file generations read exactly under one declared schema") {
    import spark.implicits._
    val t = tbl("r1")
    (0L until 40L).map(i => (i, i * 1.0)).toDF("id", "v")
      .writeTo(t).createOrReplace()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO val")
    (40L until 60L).map(i => (i, i * 1.0)).toDF("id", "val")
      .writeTo(t).append()
    spark.sql(s"ALTER TABLE $t ADD COLUMN note STRING")
    (60L until 70L).map(i => (i, i * 1.0, s"x$i")).toDF("id", "val", "note")
      .writeTo(t).append()
    val back = spark.table(t).orderBy("id").collect()
    assert(back.length == 70)
    assert(back.forall(r => r.getDouble(1) == r.getLong(0) * 1.0),
      "alias resolution must reconstitute every generation's values")
    assert(back.take(60).forall(_.isNullAt(2)))
    assert(back.drop(60).forall(r => r.getString(2) == s"x${r.getLong(0)}"))
    // field id pinned + alias recorded in the declared schema
    val f = spark.table(t).schema("val")
    assert(f.metadata.contains(StagedParquet.FieldIdKey))
    assert(f.metadata.getStringArray(StagedParquet.AliasesKey).toSeq == Seq("v"))
    // projection that drops the renamed column still works; aggregates
    // over it stay exact across generations
    assert(spark.table(t).select(sum($"val")).as[Double].head() ==
      (0L until 70L).map(_ * 1.0).sum)
  }

  test("footer pruning consults aliases; no live row ever skipped") {
    import spark.implicits._
    val t = tbl("r2")
    // two widely separated value bands land in separate files via range
    // clustering on the original name
    (0L until 1000L).map(i => (i, i * 1.0)).toDF("id", "price")
      .writeTo(t).createOrReplace()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN price TO amount")
    // a band filter on the NEW name over OLD-named footers: every
    // matching row returns (the pre-fix absent-column rule would read
    // "all null" and skip live rows)
    val got = spark.table(t).filter($"amount" >= 100.0 && $"amount" < 200.0)
    assert(got.count() == 100L)
    assert(got.agg(sum($"amount")).as[Double].head() ==
      (100L until 200L).map(_ * 1.0).sum)
    // IsNotNull + equality probes resolve through the alias too
    assert(spark.table(t).filter($"amount" === 500.0).count() == 1L)
  }

  test("COW rewrites coalesce aliases: UPDATE cannot null renamed history") {
    import spark.implicits._
    val t = tbl("r3")
    (0L until 200L).map(i => (i, i * 1.0, s"n$i")).toDF("id", "v", "name")
      .writeTo(t).createOrReplace()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO val")
    // UPDATE touches pre-rename files: the rewrite must carry the
    // renamed column's old-named bytes into the new files
    spark.sql(s"UPDATE $t SET name = 'hit' WHERE id < 50")
    val back = spark.table(t).orderBy("id").collect()
    assert(back.length == 200)
    assert(back.forall(r => r.getDouble(1) == r.getLong(0) * 1.0),
      "a COW rewrite must never null a renamed column's history")
    assert(back.take(50).forall(_.getString(2) == "hit"))
    // DELETE on the RENAMED column itself (predicate through the alias)
    spark.sql(s"DELETE FROM $t WHERE val >= 150.0")
    assert(spark.table(t).count() == 150L)
    // compaction settles bytes to the current name — and reads unchanged
    StagedParquet.compact(spark, t, minFiles = 1): Unit
    val settled = spark.table(t).orderBy("id").collect()
    assert(settled.length == 150)
    assert(settled.forall(r => r.getDouble(1) == r.getLong(0) * 1.0))
  }

  test("declared sort order follows the rename") {
    import spark.implicits._
    val t = tbl("r4")
    (0L until 100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .writeTo(t).tableProperty("sort.order", "v").createOrReplace()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO val")
    val props = StagedParquet.tableProperties(new org.apache.hadoop.fs.Path(
      StagedParquet.tableDir(spark, t)))
    assert(props.get("sort.order").contains("val"))
    // appends under the renamed order still work and read exactly
    (100L until 120L).map(i => (i, i * 1.0)).toDF("id", "val")
      .writeTo(t).append()
    assert(spark.table(t).count() == 120L)
  }

  test("guards: partition column, collisions, live equality deletes") {
    import spark.implicits._
    val t = tbl("r5")
    (0L until 60L).map(i => (i, s"p${i % 2}", i * 1.0)).toDF("id", "prio", "v")
      .writeTo(t).partitionedBy(col("prio")).createOrReplace()
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t RENAME COLUMN prio TO priority")
    }
    intercept[Exception] { spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO id") }
    spark.sql(s"ALTER TABLE $t DROP COLUMN v")
    // a tombstoned name can't be a rename target either
    intercept[Exception] { spark.sql(s"ALTER TABLE $t RENAME COLUMN id TO v") }
    // live equality deletes reference column names: rename must settle first
    val src = tbl("r5src")
    val dst = tbl("r5dst")
    def snap = (0L until 100L).map(i => (i, i * 1.0)).toDF("id", "v")
    snap.filter(lit(false)).writeTo(dst)
      .tableProperty("delete.mode", "merge-on-read").createOrReplace()
    val ckpt = java.nio.file.Files.createTempDirectory("ren_eq_ckpt").toString
    def drain(): Unit = {
      val q = spark.readStream.table(src)
        .writeStream.option("checkpointLocation", ckpt)
        .option("graft.upsert.key", "id")
        .option("graft.upsert.eq", "true")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).toTable(dst)
      q.awaitTermination()
    }
    snap.writeTo(src).createOrReplace(); drain()
    snap.filter($"id" < 5L).withColumn("v", $"v" * 10).writeTo(src).append(); drain()
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $dst RENAME COLUMN v TO val")
    }
    assert(e.getMessage.contains("equality"), s"got: $e")
    StagedParquet.compact(spark, dst): Unit
    spark.sql(s"ALTER TABLE $dst RENAME COLUMN v TO val") // settles, then ok
    assert(spark.table(dst).schema.fieldNames.toSeq == Seq("id", "val"))
  }
}
