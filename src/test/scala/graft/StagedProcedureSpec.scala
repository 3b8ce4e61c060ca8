package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL `CALL` procedures on the staged catalog
  * ([[graft.sources.v2.StagedProcedures]] via Spark 4's ProcedureCatalog):
  * the maintenance verbs — compact, evolve_partitioning, migrate_layouts,
  * vacuum — runnable and auditable from pure SQL, returning the library
  * report as the CALL's result set.
  */
class StagedProcedureSpec extends AnyFunSuite {
  private lazy val spark = { graft.sources.v2.StagedParquet.ensureCatalog(TestSpark.spark); TestSpark.spark }
  private def tbl(t: String) = s"graft_staged.procspec.$t"
  import graft.sources.v2.StagedParquet

  test("CALL compact folds small files and reports per-dir counts") {
    import spark.implicits._
    val t = tbl("p1")
    (0L until 900L).map(i => (i, s"k${i % 3}")).toDF("id", "k")
      .repartition(4).writeTo(t).option("graft.write.distribute", "none")
      .partitionedBy(col("k")).createOrReplace()
    val rep = spark.sql(s"CALL graft_staged.system.compact('$t')").collect()
    assert(rep.length == 3 && rep.forall(_.getLong(2) == 1L),
      s"each dir folds to 1 file, got ${rep.toSeq}")
    assert(rep.forall(_.getLong(1) == 4L))
    assert(spark.table(t).count() == 900L)
    // named default override: min_files above the actual count = no-op
    val rep2 = spark.sql(
      s"CALL graft_staged.system.compact('$t', min_files => 5)").collect()
    assert(rep2.isEmpty, s"already-compacted dirs must not re-fold: ${rep2.toSeq}")
  }

  test("CALL evolve_partitioning + migrate_layouts run the full cycle from SQL") {
    import spark.implicits._
    val t = tbl("p2")
    val d = StagedParquet.tableDir(spark, t)
    (0L until 1200L).map(i => (i, s"g${i % 2}", i % 5)).toDF("id", "grp", "m")
      .writeTo(t).partitionedBy(col("grp")).createOrReplace()
    val gen = spark.sql(
      s"CALL graft_staged.system.evolve_partitioning('$t', 'bucket(4,id)')")
      .collect()
    assert(gen.map(_.getLong(0)).toSeq == Seq(0L))
    (1200L until 1500L).map(i => (i, s"g${i % 2}", i % 5)).toDF("id", "grp", "m")
      .writeTo(t).append()
    assert(spark.table(t).count() == 1500L)
    val mig = spark.sql(s"CALL graft_staged.system.migrate_layouts('$t')").collect()
    assert(mig.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("_layouts/g-0", 1200L)), s"got ${mig.toSeq}")
    assert(!StagedParquet.oldLayoutsHoldData(d))
    assert(spark.table(t).count() == 1500L)
    assert(spark.table(t).select(sum($"id")).as[Long].head() == (0L until 1500L).sum)
    // grammar errors are loud, not half-applied
    val e = intercept[Throwable] {
      spark.sql(s"CALL graft_staged.system.evolve_partitioning('$t', 'year(id)')")
        .collect()
    }
    def deep(t0: Throwable): String =
      Iterator.iterate(t0)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(deep(e).contains("cannot parse transform"), deep(e))
  }

  test("CALL vacuum sweeps debris with explicit age gates") {
    import spark.implicits._
    val t = tbl("p3")
    val d = StagedParquet.tableDir(spark, t)
    (0L until 100L).map(i => (i, i * 2.0)).toDF("id", "v")
      .writeTo(t).createOrReplace()
    // plant an orphan tmp file (a crashed task's debris)
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "_tmp-deadbeef.parquet"),
      Array[Byte](1, 2, 3))
    val rep = spark.sql(
      s"CALL graft_staged.system.vacuum('$t', min_age_ms => 0, version_retain_ms => 0)")
      .collect()
    assert(rep.exists(r => r.getString(0).contains("_tmp-deadbeef") &&
      r.getString(1) == "orphan_tmp"), s"got ${rep.toSeq}")
    assert(!new java.io.File(d, "_tmp-deadbeef.parquet").exists)
    assert(spark.table(t).count() == 100L)
  }

  test("SHOW PROCEDURES lists the system verbs; unknown CALL is loud") {
    val shown = spark.sql("SHOW PROCEDURES IN graft_staged.system").collect()
      .map(_.toString).mkString("\n")
    for (n <- graft.sources.v2.StagedProcedures.names)
      assert(shown.contains(n), s"$n missing from: $shown")
    val e = intercept[Throwable] {
      spark.sql("CALL graft_staged.system.no_such_verb()").collect()
    }
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains("no such procedure"))))
  }
}
