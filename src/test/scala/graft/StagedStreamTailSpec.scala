package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming reads of staged tables —
  * `spark.readStream.table("graft_staged.ns.t")` through
  * [[graft.sources.v2.StagedMicroBatchStream]]. Contracts under test: an
  * AvailableNow pass drains exactly the committed files; offsets carry the
  * file manifest, so a RESTART from the checkpoint reads only files
  * appended since (no replay, no loss — driver memory holds no source
  * state); identity partition values reconstitute in streamed rows exactly
  * as in batch reads.
  */
class StagedStreamTailSpec extends AnyFunSuite {
  private lazy val spark = { graft.sources.v2.StagedParquet.ensureCatalog(TestSpark.spark); TestSpark.spark }
  private def tbl(t: String) = s"graft_staged.streamtail.$t"

  test("availableNow drains the table; a checkpoint restart reads only new appends") {
    import spark.implicits._
    val t = tbl("s1")
    val ckpt = java.nio.file.Files.createTempDirectory("tail_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("tail_out").toString
    (0L until 100L).map(i => (i % 4, i)).toDF("k", "id")
      .writeTo(t).partitionedBy(col("k")).createOrReplace()

    // a fault-tolerant (file) sink: the same checkpoint resumes across
    // query restarts, so the OUTPUT row count discriminates resume (+new
    // rows only) from replay (+everything again)
    def drain(): Unit = {
      val q = spark.readStream.table(t)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val first = spark.read.parquet(out).collect()
    assert(first.length == 100)
    // identity partition values reconstitute from the directory names
    assert(first.forall(r => r.getLong(0) == r.getLong(1) % 4))

    // two more commits land new files; the SAME checkpoint must deliver
    // exactly those — 150 total afterwards, not 100+150
    (100L until 130L).map(i => (i % 4, i)).toDF("k", "id").writeTo(t).append()
    (130L until 150L).map(i => (i % 4, i)).toDF("k", "id").writeTo(t).append()
    drain()
    val second = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(second.length == 150,
      s"restart must append only the 50 new rows, got ${second.length} total")
    assert(second.toSeq == (0L until 150L).toSeq)

    // nothing new -> an empty pass, not a replay
    drain()
    assert(spark.read.parquet(out).count() == 150L)
  }

  test("streamed rows match the batch read exactly (schema and content)") {
    import spark.implicits._
    val t = tbl("s2")
    val ckpt = java.nio.file.Files.createTempDirectory("tail_ckpt2").toString
    (0L until 60L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "v")
      .writeTo(t).createOrReplace()
    val q = spark.readStream.table(t)
      .writeStream.format("memory").queryName("tail_b")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("tail_b")
    assert(streamed.schema == spark.table(t).schema)
    assert(streamed.orderBy("id").collect().toSeq ==
      spark.table(t).orderBy("id").collect().toSeq)
  }
}
