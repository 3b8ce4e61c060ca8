package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shared staged fixtures (r12): read-only lifecycle inputs stage ONCE
  * into a fingerprint-keyed shared namespace; mutating lifecycle queries
  * start from a FILE-LEVEL copy in their own namespace. Contracts:
  *   - mutation isolation: running the whole mutating set (DV deletes,
  *     COW delete, compaction, history lifecycle) leaves every shared
  *     tree byte-identical — no data file touched, no deletion vector
  *     planted, no version history grown;
  *   - reset semantics: a mutating query's repeat run starts from the
  *     pristine copy and returns the identical result (version
  *     arithmetic is run-invariant at base 0);
  *   - reuse: the second call to a read-only consumer does not restage
  *     (same file identities before and after).
  */
class SharedFixtureSpec extends AnyFunSuite {
  private lazy val spark = { graft.sources.v2.StagedParquet.ensureCatalog(TestSpark.spark); TestSpark.spark }
  private val d = "/root/testdata/sf0.001"

  private def sharedTrees(): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles).map(_.toSeq.flatMap(walk)).getOrElse(Nil)
    val root = new java.io.File("/tmp/graft_stage/v2")
    Option(root.listFiles).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("sh"))
      .flatMap(walk)
      .map(f => f.getAbsolutePath -> (f.length, f.lastModified)).toMap
  }

  test("mutating lifecycle queries never touch the shared fixture bytes") {
    import graft.queries.Ingest
    // first calls build the shared fixtures (and run one full mutation)
    val dv1 = Ingest.deleteVectors(spark, d).collect().toSeq
    Ingest.timeTravel(spark, d).collect(): Unit
    val before = sharedTrees()
    assert(before.nonEmpty, "shared fixtures must exist after the first run")
    assert(!before.keys.exists(_.contains("/_dv-")),
      "no deletion vector may ever land in a shared tree")
    // the whole mutating set, plus repeats
    val dv2 = Ingest.deleteVectors(spark, d).collect().toSeq
    Ingest.metaPartitions(spark, d).collect(): Unit
    Ingest.metaHistory(spark, d).collect(): Unit
    Ingest.timeTravel(spark, d).collect(): Unit
    // reset semantics: identical result on the repeat run
    assert(dv1.map(_.toString) == dv2.map(_.toString),
      "a mutating query's repeat run must reproduce its result exactly")
    // byte isolation: every shared file identical in length AND mtime
    val after = sharedTrees()
    assert(after == before,
      s"shared trees changed: ${(after.toSet diff before.toSet).take(5)} / ${(before.toSet diff after.toSet).take(5)}")
  }

  test("read-only consumers reuse the shared staging (no restage)") {
    import graft.queries.Ingest
    Ingest.statsScan(spark, d).collect(): Unit
    val before = sharedTrees()
    Ingest.statsScan(spark, d).collect(): Unit
    Ingest.spjJoin(spark, d).collect(): Unit
    Ingest.statsScan(spark, d).collect(): Unit
    val after = sharedTrees()
    val prioBefore = before.filter(_._1.contains("orders_by_prio"))
    val prioAfter = after.filter(_._1.contains("orders_by_prio"))
    assert(prioBefore.nonEmpty && prioBefore == prioAfter,
      "a second read must reuse the staged files, not rewrite them")
  }
}
