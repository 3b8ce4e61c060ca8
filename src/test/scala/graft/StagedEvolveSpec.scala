package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Partition-spec EVOLUTION on staged tables
  * ([[graft.sources.v2.StagedParquet.evolvePartitioning]] /
  * [[graft.sources.v2.StagedParquet.migrateLayouts]] — Iceberg's flagship
  * metadata operation). Contracts under test:
  *   - evolution is METADATA-ONLY: every data file survives by rename
  *     (same length and mtime), zero bytes rewritten;
  *   - mixed-layout reads are exact — including filters on a column that
  *     was identity in the OLD spec (absent from old footers: the
  *     zone-map guard must not skip those files) and on the new
  *     partition column;
  *   - pruning still prunes: a filter on the current partition column
  *     opens only the matching current-layout dirs plus the (conservative)
  *     old generation;
  *   - DELETE / UPDATE / compaction reach every generation with its own
  *     spec and tiering; the statement stays bounded-jobs;
  *   - the streaming tail SURVIVES evolution (manifest translation): a
  *     checkpointed stream resumes across an evolve with no replay and no
  *     loss;
  *   - time travel reconstructs pre-evolution versions at the old layout;
  *     the change feed rejects ranges crossing an evolution;
  *   - migrateLayouts settles old generations into the current layout
  *     (row-exact, generations emptied, idempotent rerun) and the
  *     footer-agg pushdown returns;
  *   - dynamic partition overwrite on an unsettled table fails loudly.
  */
class StagedEvolveSpec extends AnyFunSuite {
  private lazy val spark = { graft.sources.v2.StagedParquet.ensureCatalog(TestSpark.spark); TestSpark.spark }
  private def tbl(t: String) = s"graft_staged.evolvespec.$t"
  import graft.sources.v2.{PartField, StagedParquet}

  private def dataFiles(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles).map(_.toSeq.flatMap(walk)).getOrElse(Nil)
    walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(f => f.getName -> (f.length, f.lastModified)).toMap
  }

  test("evolve is metadata-only; mixed-layout reads and filters are exact") {
    import spark.implicits._
    val t = tbl("e1")
    val dir = StagedParquet.tableDir(spark, t)
    (0L until 3000L).map(i => (i, s"p${i % 3}", i % 7, i * 2.0))
      .toDF("id", "prio", "grp", "v")
      .writeTo(t).partitionedBy(col("prio")).createOrReplace()
    val before = dataFiles(dir)
    StagedParquet.evolvePartitioning(spark, t,
      Seq(PartField("grp", "identity"))): Unit
    // every pre-evolution file survived by RENAME: same name/len/mtime
    assert(dataFiles(dir) == before, "evolution must not rewrite a byte")
    // post-evolution rows land in the new layout
    (3000L until 4500L).map(i => (i, s"p${i % 3}", i % 7, i * 2.0))
      .toDF("id", "prio", "grp", "v").writeTo(t).append()
    assert(new java.io.File(dir, "grp=0").exists,
      "appends after evolve must use the new spec's directories")
    val df = spark.table(t)
    assert(df.count() == 4500L)
    // filter on the OLD identity column: absent from old-gen footers
    // (reconstituted from dirs) AND stored in new-gen files — both sides
    // must return exactly their rows
    assert(df.filter($"prio" === "p1").count() == 1500L)
    // filter on the NEW partition column: stored in old-gen files,
    // directory-valued in the new layout
    assert(df.filter($"grp" === 3L).count() ===
      (0L until 4500L).count(_ % 7 == 3).toLong)
    // a point lookup crossing both layouts
    assert(df.filter($"id" === 2999L).select($"prio", $"grp").as[(String, Long)]
      .head() == (("p2", 2999L % 7)))
    assert(df.filter($"id" === 3001L).select($"prio", $"grp").as[(String, Long)]
      .head() == (("p1", 3001L % 7)))
  }

  test("current-layout pruning still prunes after evolve") {
    import spark.implicits._
    val t = tbl("e2")
    (0L until 1200L).map(i => (i, s"p${i % 2}", i % 4)).toDF("id", "prio", "grp")
      .writeTo(t).partitionedBy(col("prio")).createOrReplace()
    StagedParquet.evolvePartitioning(spark, t,
      Seq(PartField("grp", "identity"))): Unit
    (1200L until 2400L).map(i => (i, s"p${i % 2}", i % 4)).toDF("id", "prio", "grp")
      .writeTo(t).append()
    graft.sources.v2.StagedReaderFactory.readersCreated.set(0L)
    val n = spark.table(t).filter($"grp" === 1L).count()
    val opened = graft.sources.v2.StagedReaderFactory.readersCreated.get()
    assert(n == (0L until 2400L).count(_ % 4 == 1).toLong)
    // 2 old-gen dirs (conservative: grp not in their spec) + 1 of the 4
    // new-layout dirs — the other 3 new dirs never open
    assert(opened <= 3L, s"pruned read opened $opened splits, expected <= 3")
  }

  test("DELETE and UPDATE reach every generation with its own tiering") {
    import spark.implicits._
    val t = tbl("e3")
    (0L until 2000L).map(i => (i, s"p${i % 2}", i % 4, i * 1.0))
      .toDF("id", "prio", "grp", "v")
      .writeTo(t).partitionedBy(col("prio")).createOrReplace()
    StagedParquet.evolvePartitioning(spark, t,
      Seq(PartField("grp", "identity"))): Unit
    (2000L until 4000L).map(i => (i, s"p${i % 2}", i % 4, i * 1.0))
      .toDF("id", "prio", "grp", "v").writeTo(t).append()
    // band delete crossing BOTH layouts
    spark.sql(s"DELETE FROM $t WHERE id >= 1500 AND id < 2500")
    assert(spark.table(t).count() == 3000L)
    assert(spark.table(t).filter($"id" >= 1500L && $"id" < 2500L).count() == 0L)
    // tier-1 on the OLD spec: an identity predicate of the old generation
    // drops its dir without reading a byte and leaves the new layout alone
    val rep = StagedParquet.deleteWhere(spark, t, Seq(
      org.apache.spark.sql.sources.EqualTo("prio", "p0"),
      org.apache.spark.sql.sources.LessThan("id", 1000L)))
    assert(rep.nonEmpty && rep.forall(_._1.startsWith("_layouts/")),
      s"old-identity delete must touch only old-generation dirs, got $rep")
    assert(spark.table(t).filter($"prio" === "p0" && $"id" < 1000L).count() == 0L)
    assert(spark.table(t).filter($"prio" === "p1" && $"id" < 1000L).count() == 500L)
    // UPDATE with a SET column that is data in every layout
    StagedParquet.updateWhere(spark, t,
      Seq("v" -> (col("v") + 100000.0)),
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 3900L))): Unit
    assert(spark.table(t).filter($"id" >= 3900L && $"v" < 100000.0).count() == 0L)
    // SET on a column ANY layout partitions by is rejected
    intercept[IllegalArgumentException] {
      StagedParquet.updateWhere(spark, t, Seq("prio" -> lit("px")),
        Seq(org.apache.spark.sql.sources.EqualTo("grp", 0L)))
    }
  }

  test("compaction folds every generation in place") {
    import spark.implicits._
    val t = tbl("e4")
    (0L until 900L).map(i => (i, s"p${i % 3}", i % 2)).toDF("id", "prio", "grp")
      .repartition(3).writeTo(t).option("graft.write.distribute", "none")
      .partitionedBy(col("prio")).createOrReplace() // 3 files per old dir
    StagedParquet.evolvePartitioning(spark, t,
      Seq(PartField("grp", "identity"))): Unit
    (900L until 1200L).map(i => (i, s"p${i % 3}", i % 2)).toDF("id", "prio", "grp")
      .repartition(4).writeTo(t).option("graft.write.distribute", "none")
      .append() // 4 files per new-layout dir
    val rep = StagedParquet.compact(spark, t)
    assert(rep.exists(_._1.startsWith("_layouts/")), "old gens must fold")
    assert(rep.exists(r => !r._1.startsWith("_layouts/")),
      "the current layout must fold")
    assert(rep.forall(_._3 == 1L), s"each dir folds to one file, got $rep")
    assert(spark.table(t).count() == 1200L)
    assert(spark.table(t).select(sum($"id")).as[Long].head() ==
      (0L until 1200L).sum)
  }

  test("root-swap mutations on an unpartitioned evolved table reject loudly") {
    import spark.implicits._
    val t = tbl("e4b")
    (0L until 300L).map(i => (i, s"p${i % 3}")).toDF("id", "prio")
      .repartition(2).writeTo(t).option("graft.write.distribute", "none")
      .partitionedBy(col("prio")).createOrReplace()
    StagedParquet.evolvePartitioning(spark, t, Seq.empty): Unit // unpartitioned
    (300L until 400L).map(i => (i, s"p${i % 3}")).toDF("id", "prio")
      .repartition(2).writeTo(t).option("graft.write.distribute", "none")
      .append()
    // an unpartitioned current layout mutates by ROOT swap, which would
    // strand the live generations in the retained tree — both maintenance
    // ops reject at analysis, nothing half-applies
    val e1 = intercept[IllegalArgumentException] {
      StagedParquet.compact(spark, t)
    }
    assert(e1.getMessage.contains("migrateLayouts"))
    val e2 = intercept[IllegalArgumentException] {
      StagedParquet.deleteWhere(spark, t, Seq(
        org.apache.spark.sql.sources.LessThan("id", 10L)))
    }
    assert(e2.getMessage.contains("migrateLayouts"))
    assert(spark.table(t).count() == 400L, "nothing may half-apply")
    // settling restores both
    StagedParquet.migrateLayouts(spark, t): Unit
    StagedParquet.deleteWhere(spark, t, Seq(
      org.apache.spark.sql.sources.LessThan("id", 10L))): Unit
    assert(spark.table(t).count() == 390L)
  }

  test("a checkpointed stream tail survives evolution (manifest translation)") {
    import spark.implicits._
    val t = tbl("e5")
    val ckpt = java.nio.file.Files.createTempDirectory("evo_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("evo_out").toString
    (0L until 100L).map(i => (i % 4, i)).toDF("k", "id")
      .writeTo(t).partitionedBy(col("k")).createOrReplace()
    def drain(): Unit = {
      val q = spark.readStream.table(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() == 100L)
    // evolve, then append under the new spec: the SAME checkpoint must
    // deliver exactly the new rows (manifest ids kept, paths translated)
    StagedParquet.evolvePartitioning(spark, t,
      Seq(PartField("id", "bucket", 4))): Unit
    (100L until 140L).map(i => (i % 4, i)).toDF("k", "id").writeTo(t).append()
    drain()
    val ids = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(ids.length == 140, s"resume across evolve must add only the 40 new rows, got ${ids.length}")
    assert(ids.toSeq == (0L until 140L).toSeq)
    // a FRESH stream replays the whole table through translated manifests
    val ckpt2 = java.nio.file.Files.createTempDirectory("evo_ckpt2").toString
    val out2 = java.nio.file.Files.createTempDirectory("evo_out2").toString
    val q2 = spark.readStream.table(t)
      .writeStream.format("parquet").option("path", out2)
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val fresh = spark.read.parquet(out2)
    assert(fresh.count() == 140L)
    // identity values of the OLD spec reconstitute from translated paths
    assert(fresh.filter($"k" =!= $"id" % 4).count() == 0L)
  }

  test("time travel reconstructs pre-evolution versions; CDF rejects the crossing") {
    import spark.implicits._
    val t = tbl("e6")
    val d = StagedParquet.tableDir(spark, t)
    (0L until 600L).map(i => (i, s"p${i % 2}")).toDF("id", "prio")
      .writeTo(t).partitionedBy(col("prio")).createOrReplace()
    val v1 = StagedParquet.currentVersion(d)
    StagedParquet.evolvePartitioning(spark, t, Seq.empty): Unit
    (600L until 900L).map(i => (i, s"p${i % 2}")).toDF("id", "prio")
      .writeTo(t).append()
    val vHead = StagedParquet.currentVersion(d)
    // pre-evolution version: the old layout, old partitioning, exact rows
    val old = spark.sql(s"SELECT * FROM $t VERSION AS OF $v1")
    assert(old.count() == 600L)
    assert(old.filter($"prio" === "p0").count() == 300L)
    // head version through the snapshot path: the mixed state
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF $vHead").count() == 900L)
    val e = intercept[Exception] {
      StagedParquet.changesBetween(spark, t, v1, vHead).count()
    }
    assert(e.getMessage.contains("evolution"),
      s"CDF across an evolve must reject loudly, got: ${e.getMessage}")
    // the feed still serves ranges on either side of the evolution
    assert(StagedParquet.changesBetween(spark, t, vHead - 1, vHead)
      .filter($"_change_type" === "insert").count() == 300L)
  }

  test("migrateLayouts settles generations row-exactly and is idempotent") {
    import spark.implicits._
    val t = tbl("e7")
    val d = StagedParquet.tableDir(spark, t)
    (0L until 1000L).map(i => (i, s"p${i % 2}", i % 5)).toDF("id", "prio", "grp")
      .writeTo(t).partitionedBy(col("prio")).createOrReplace()
    StagedParquet.evolvePartitioning(spark, t,
      Seq(PartField("grp", "identity"))): Unit
    (1000L until 1400L).map(i => (i, s"p${i % 2}", i % 5)).toDF("id", "prio", "grp")
      .writeTo(t).append()
    assert(StagedParquet.oldLayoutsHoldData(d))
    val rep = StagedParquet.migrateLayouts(spark, t)
    assert(rep.map(_._2).sum == 1000L, s"migrated row count, got $rep")
    assert(!StagedParquet.oldLayoutsHoldData(d), "generations must be empty")
    assert(spark.table(t).count() == 1400L)
    assert(spark.table(t).select(sum($"id")).as[Long].head() ==
      (0L until 1400L).sum)
    // every row now lives in the current layout: grp pruning opens 1/5
    graft.sources.v2.StagedReaderFactory.readersCreated.set(0L)
    assert(spark.table(t).filter($"grp" === 2L).count() ==
      (0L until 1400L).count(_ % 5 == 2).toLong)
    val opened = graft.sources.v2.StagedReaderFactory.readersCreated.get()
    assert(opened <= 2L, s"post-migration pruned read opened $opened")
    // rerun is a no-op
    assert(StagedParquet.migrateLayouts(spark, t).isEmpty)
    // footer-agg pushdown RETURNS once the generations are empty
    graft.sources.v2.StagedReaderFactory.readersCreated.set(0L)
    assert(spark.table(t).groupBy($"grp").count().collect().length == 5)
    assert(graft.sources.v2.StagedReaderFactory.readersCreated.get() == 0L,
      "count-by-partition must answer from footers after migration")
    // time travel to the pre-migration mixed state still works
    val vPre = StagedParquet.currentVersion(d) - 2 // before append+drop
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF $vPre").count() == 1400L)
  }

  test("dynamic partition overwrite fails loudly while generations hold data") {
    import spark.implicits._
    val t = tbl("e8")
    (0L until 200L).map(i => (i, s"p${i % 2}", i % 3)).toDF("id", "prio", "grp")
      .writeTo(t).partitionedBy(col("prio")).createOrReplace()
    StagedParquet.evolvePartitioning(spark, t,
      Seq(PartField("grp", "identity"))): Unit
    val e = intercept[Exception] {
      (0L until 10L).map(i => (i, "px", i % 3)).toDF("id", "prio", "grp")
        .writeTo(t).overwritePartitions()
    }
    assert(e.getMessage != null && e.getMessage.contains("migrateLayouts"),
      s"expected the settle-first rejection, got: $e")
  }
}
