package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{StagedFilesCommit, StagedParquet, StagedStreamingWrite}

/** Streaming writes into staged tables —
  * `df.writeStream.toTable("graft_staged.ns.t")` through
  * [[graft.sources.v2.StagedStreamingWrite]]. Contracts under test: each
  * epoch appends through the two-phase file protocol and lands exactly ONE
  * commit manifest (a downstream tail sees one offset increment per
  * trigger); a checkpoint restart appends only new source data (no
  * duplicates in the destination); a crash-REPLAYED epoch commit — same
  * epoch id delivered twice — is detected via the manifest `#txn=` marker
  * plus the per-query cursor and discarded, files deleted.
  */
class StagedStreamIngestSpec extends AnyFunSuite {
  private lazy val spark = { StagedParquet.ensureCatalog(TestSpark.spark); TestSpark.spark }
  private def tbl(t: String) = s"graft_staged.streamingest.$t"

  private def manifestCount(table: String): Int =
    StagedParquet.manifestIds(
      new Path(StagedParquet.tableDir(spark, table))).length

  test("toTable appends per epoch; restart reads only new source commits, no duplicates") {
    import spark.implicits._
    val src = tbl("src1")
    val dst = tbl("dst1")
    val ckpt = java.nio.file.Files.createTempDirectory("ingest_ckpt").toString
    (0L until 60L).map(i => (i, i * 2.0)).toDF("id", "v")
      .writeTo(src).createOrReplace()
    (0L until 60L).map(i => (i, i * 2.0)).toDF("id", "v")
      .filter(lit(false)).writeTo(dst).createOrReplace()
    def drain(): Unit = {
      val q = spark.readStream.table(src)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).toTable(dst)
      q.awaitTermination()
    }
    drain()
    assert(spark.table(dst).count() == 60L)
    // one epoch -> exactly one destination manifest
    assert(manifestCount(dst) == 1, s"expected 1 manifest, got ${manifestCount(dst)}")
    // two more source commits; the restarted stream must deliver exactly
    // those (90 total, never 60+90)
    (60L until 90L).map(i => (i, i * 2.0)).toDF("id", "v").writeTo(src).append()
    drain()
    val ids = spark.table(dst).select($"id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 90L).toSeq, s"got ${ids.length} rows")
    assert(manifestCount(dst) == 2)
    // nothing new -> empty pass, nothing appended
    drain()
    assert(spark.table(dst).count() == 90L)
  }

  test("partitioned destination: streamed rows route to their partition dirs") {
    import spark.implicits._
    val src = tbl("src2")
    val dst = tbl("dst2")
    val ckpt = java.nio.file.Files.createTempDirectory("ingest_ckpt2").toString
    (0L until 40L).map(i => (i % 4, i)).toDF("k", "id")
      .writeTo(src).createOrReplace()
    (0L until 1L).map(i => (i, i)).toDF("k", "id")
      .filter(lit(false)).writeTo(dst).partitionedBy(col("k")).createOrReplace()
    val q = spark.readStream.table(src)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).toTable(dst)
    q.awaitTermination()
    val dir = StagedParquet.tableDir(spark, dst)
    assert((0 to 3).forall(k => new java.io.File(s"$dir/k=$k").isDirectory))
    assert(spark.table(dst).filter($"k" === $"id" % 4).count() == 40L)
  }

  test("a replayed epoch commit is discarded: files deleted, no second manifest") {
    import spark.implicits._
    val dst = tbl("dst3")
    (0L until 20L).map(i => (i, i * 1.0)).toDF("id", "v")
      .writeTo(dst).createOrReplace()
    val dir = StagedParquet.tableDir(spark, dst)
    val dataFile = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    def plant(name: String): Unit =
      java.nio.file.Files.copy(dataFile.toPath,
        new java.io.File(dir, name).toPath)
    val schema = spark.table(dst).schema
    val before = spark.table(dst).count()
    val perFile = spark.read.parquet(dataFile.getPath).count()

    // run 1 commits epoch 0
    val w1 = new StagedStreamingWrite(dir, schema, Seq.empty, "queryA")
    plant("extra1.parquet")
    w1.commit(0L, Array(StagedFilesCommit(Seq("extra1.parquet"), perFile)))
    assert(spark.table(dst).count() == before + perFile)
    val manifestsAfterFirst = manifestCount(dst)

    // run 2 (a restart: fresh instance = fresh nonce) REPLAYS epoch 0 —
    // its files must be dropped, the table and manifest log unchanged
    val w2 = new StagedStreamingWrite(dir, schema, Seq.empty, "queryA")
    plant("extra2.parquet")
    w2.commit(0L, Array(StagedFilesCommit(Seq("extra2.parquet"), perFile)))
    assert(!new java.io.File(dir, "extra2.parquet").exists,
      "a replayed epoch's files must be deleted")
    assert(spark.table(dst).count() == before + perFile)
    assert(manifestCount(dst) == manifestsAfterFirst)

    // the same run then commits the NEXT epoch normally
    plant("extra3.parquet")
    w2.commit(1L, Array(StagedFilesCommit(Seq("extra3.parquet"), perFile)))
    assert(spark.table(dst).count() == before + 2 * perFile)
    assert(manifestCount(dst) == manifestsAfterFirst + 1)

    // crash window: the cursor file is lost after a commit — the txn
    // marker in the manifest alone must still catch the replay
    new java.io.File(dir, "_stream-queryA.txt").delete()
    plant("extra4.parquet")
    val w3 = new StagedStreamingWrite(dir, schema, Seq.empty, "queryA")
    w3.commit(1L, Array(StagedFilesCommit(Seq("extra4.parquet"), perFile)))
    assert(!new java.io.File(dir, "extra4.parquet").exists,
      "txn marker must catch a replay even without the cursor file")
    assert(spark.table(dst).count() == before + 2 * perFile)
  }
}
