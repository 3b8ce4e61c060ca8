package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY.md §2 "streaming") with exact
  * batch twins. The transformation logic lives here ONCE and is applied to
  * either a batch or a streaming source — guaranteeing the batch-parity the
  * driver's oracle checks, and letting the same code run `readStream` →
  * `writeStream` on a cluster (watermarks bound state; no unbounded buffers).
  */
object Streams {

  /** Tumbling 30-minute window counts per event type. On a stream the
    * watermark lets Spark drop window state 1h after the window closes.
    */
  def windowAgg(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Stateful event dedup by event_id. On a stream, the watermark bounds the
    * dedup state (ids older than 1h are evicted); in batch it's an exact
    * dropDuplicates.
    */
  def dedupEvents(events: DataFrame, withWatermark: Boolean): DataFrame =
    if (withWatermark)
      events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark("event_id")
    else
      events.dropDuplicates("event_id")

  /** Open a directory of event parquet files as a stream — the production
    * ingestion layout (`readStream.format("parquet")` watches the dir; new
    * files become micro-batches). The directory's files must already carry
    * micro-second timestamps (use [[stageEventsDir]] to build one from the
    * testdata's nanosecond file).
    */
  def eventsStream(spark: SparkSession, eventsDir: String): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    spark.readStream.schema(schema).parquet(eventsDir)
  }

  /** Stage the (nanosecond-timestamped, single-file) testdata events table
    * into a streaming-source directory with normalized timestamps.
    */
  def stageEventsDir(spark: SparkSession, sfDir: String, outDir: String): String = {
    graft.core.Tables.events(spark, sfDir)
      .write.mode("overwrite").parquet(outDir)
    outDir
  }
}
