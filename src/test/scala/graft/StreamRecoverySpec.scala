package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Crash-recovery parity for the transformWithState/RocksDB path: a query
  * stopped after consuming a PREFIX of the source must, when restarted
  * from its checkpoint, process exactly the remainder and land on the
  * same final state as one batch pass over everything (exactly-once
  * resume). The split is deterministic — run 1's source directory holds
  * only half the files, the rest appear before run 2 — so the test never
  * depends on trigger timing to interrupt mid-stream. The sink is
  * foreachBatch→parquet-append (the memory sink refuses checkpoint
  * recovery; the file path is also the production merge-sink shape).
  */
class StreamRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("transformWithState resumes from checkpoint: exactly-once vs the batch oracle") {
    val dir = "/tmp/graft_stream_recovery_src"
    val ckpt = "/tmp/graft_stream_recovery_ckpt"
    val out = "/tmp/graft_stream_recovery_out"
    Seq(dir, ckpt, out).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val events = graft.core.Tables.events(spark, sf)
    val half1 = events.filter(col("event_id") % 2 === 0)
    val half2 = events.filter(col("event_id") % 2 =!= 0)
    half1.repartition(3).write.mode("overwrite").parquet(dir)

    def src = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    def runOnce(): Long = {
      val q = Streams.runningTotals(src).writeStream
        .foreachBatch((df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(out))
        .outputMode("update").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      q.recentProgress.map(_.numInputRows).sum
    }

    // run 1: consumes the staged prefix across several micro-batches, then
    // terminates — its checkpoint records the consumed files + state
    assert(runOnce() == half1.count())
    // the remainder "arrives" while the query is down
    half2.repartition(3).write.mode("append").parquet(dir)
    // run 2: a FRESH query object resumes from the same checkpoint —
    // exactly-once means it reads only the new files, never reprocessing
    // what the checkpoint already committed
    assert(runOnce() == half2.count())

    // final state = last emitted row per user across both runs (update
    // mode emits monotone running totals, so max = final)
    val got = spark.read.parquet(out)
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"), max(col("sum_cents")).as("sum_cents"))
      .orderBy("user_id").collect().map(_.toString)
    val batch = events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("sum_cents"))
      .orderBy("user_id").collect().map(_.toString)
    assert(got.sameElements(batch),
      s"resumed ${got.take(3).mkString(",")} vs batch ${batch.take(3).mkString(",")}")
  }
}
