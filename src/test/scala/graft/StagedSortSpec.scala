package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Declared sort order (`sort.order` table property). Contracts:
  *   - the ENGINE sorts the write (the caller never calls sort): every
  *     committed file is physically ordered by the declared columns;
  *   - two bucketed sorted tables merge-join with ZERO exchanges and
  *     ZERO Sort nodes (SupportsReportOrdering + key-grouped SPJ);
  *   - HONESTY GATE: an append that gives a bucket a second file
  *     silently withdraws the ordering claim (Sort nodes return, results
  *     unchanged); compaction re-sorts the merged bins and restores the
  *     sort-free plan;
  *   - a COW DELETE's rewritten files stay sorted.
  */
class StagedSortSpec extends AnyFunSuite {
  private lazy val spark = { graft.sources.v2.StagedParquet.ensureCatalog(TestSpark.spark); TestSpark.spark }
  private def tbl(t: String) = s"graft_staged.sortspec.$t"
  import graft.sources.v2.StagedParquet

  private def parquetFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_"))

  private def isSorted(file: String, col0: String): Boolean = {
    val vals = spark.read.parquet(file).select(col(col0))
      .collect().map(_.getLong(0)).toSeq
    vals == vals.sorted
  }

  private def joinPlan(a: String, b: String): (String, Long) = {
    val o = spark.table(a); val c = spark.table(b)
    val j = o.hint("merge").join(c, o("key") === c("key")).select(o("key"), c("w"))
    (j.queryExecution.executedPlan.toString, j.count())
  }

  test("engine-sorted writes: sort-free exchange-free merge join; append withdraws; compact restores") {
    import spark.implicits._
    val ta = tbl("s1a"); val tb = tbl("s1b")
    // deliberately UNSORTED input, several shuffled partitions: only the
    // engine's requiredOrdering can make the files sorted
    (0L until 4000L).map(i => ((i * 2654435761L) % 4000L, i))
      .toDF("key", "v").repartition(6)
      .writeTo(ta).tableProperty("sort.order", "key")
      .partitionedBy(bucket(4, col("key"))).createOrReplace()
    (0L until 4000L).map(i => ((i * 40503L) % 4000L, i * 1.0))
      .toDF("key", "w").repartition(6)
      .writeTo(tb).tableProperty("sort.order", "key")
      .partitionedBy(bucket(4, col("key"))).createOrReplace()
    val dirA = StagedParquet.tableDir(spark, ta)
    // physical proof: every committed file is sorted though the caller never sorted
    val bucketDirs = Option(new java.io.File(dirA).listFiles).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.contains("=")).map(_.getPath)
    assert(bucketDirs.size == 4)
    bucketDirs.foreach { bd =>
      parquetFiles(bd).foreach(f =>
        assert(isSorted(f.getPath, "key"), s"unsorted file ${f.getPath}"))
    }
    // plan proof: merge join with zero exchanges AND zero sorts
    val (p1, n1) = joinPlan(ta, tb)
    assert(p1.contains("SortMergeJoin"), p1.take(1500))
    assert(!p1.contains("Exchange"), s"sorted SPJ shuffled: ${p1.take(1500)}")
    assert(!p1.contains("Sort ["), s"sorted SPJ re-sorted: ${p1.take(1500)}")
    // the join's content equals the raw-data join
    val expected = spark.table(ta).as("o").join(spark.table(tb).as("c"), "key").count()
    assert(n1 == expected)
    // APPEND: a second file lands in some bucket — the ordering claim
    // must silently withdraw (Sort nodes return), content stays right
    Seq((1L, 99999L), (2L, 99998L)).toDF("key", "v").writeTo(ta).append()
    val (p2, n2) = joinPlan(ta, tb)
    assert(p2.contains("Sort ["),
      s"claim must withdraw once a bucket has two files: ${p2.take(1500)}")
    assert(n2 == n1 + 2)
    // COMPACT: bins re-sort, one file per bucket again, claim returns
    StagedParquet.compact(spark, ta): Unit
    bucketDirs.foreach { bd =>
      val fs = parquetFiles(bd)
      assert(fs.size == 1, s"$bd still has ${fs.size} files")
      assert(isSorted(fs.head.getPath, "key"), s"compact broke sort in $bd")
    }
    val (p3, n3) = joinPlan(ta, tb)
    assert(!p3.contains("Sort [") && !p3.contains("Exchange"), p3.take(1500))
    assert(n3 == n2)
  }

  test("a COW DELETE re-sorts its rewritten files; the sort-free plan survives") {
    import spark.implicits._
    val t = tbl("s2")
    (0L until 3000L).map(i => ((i * 48271L) % 3000L, i)).toDF("key", "v")
      .repartition(5)
      .writeTo(t).tableProperty("sort.order", "key")
      .partitionedBy(bucket(2, col("key"))).createOrReplace()
    StagedParquet.deleteWhere(spark, t, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("key", 1000L),
      org.apache.spark.sql.sources.LessThan("key", 1100L))): Unit
    val dir = StagedParquet.tableDir(spark, t)
    Option(new java.io.File(dir).listFiles).toSeq.flatten.filter(_.isDirectory)
      .foreach { bd =>
        parquetFiles(bd.getPath).foreach(f =>
          assert(isSorted(f.getPath, "key"), s"COW unsorted ${f.getPath}"))
      }
    assert(spark.table(t).filter($"key" >= 1000L && $"key" < 1100L).count() == 0L)
    assert(spark.table(t).count() == 2900L)
  }

  test("sort.order column must exist; streaming appends are rejected on sorted tables") {
    import spark.implicits._
    val t = tbl("s3")
    val e = intercept[IllegalArgumentException] {
      Seq((1L, 2L)).toDF("a", "b")
        .writeTo(t).tableProperty("sort.order", "nope").createOrReplace()
    }
    assert(e.getMessage.contains("sort.order"))
  }
}
