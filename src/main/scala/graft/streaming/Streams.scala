package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Top-level (public) so Catalyst's generated encoder projections can
// access them — codegen cannot touch private nested classes.
case class SessEvent(user_id: Long, ts: java.sql.Timestamp)
case class SessState(n_sessions: Long, n_events: Long, last_sec: Long)
case class RunEvent(user_id: Long, value: Double)
case class RunTotals(user_id: Long, n_events: Long, sum_cents: Long)

/** Per-user running totals on Spark 4's `transformWithState` API (the
  * successor to flatMapGroupsWithState: named state variables, TTL
  * support, RocksDB-backed). State is one ValueState[RunTotals] per user;
  * each (micro-)batch folds its rows and emits the updated totals.
  *
  * Determinism: values accumulate as exact cent-longs (2-dp HALF_UP, the
  * same rounding Spark's cast-to-decimal(18,2) applies), so fold order —
  * which transformWithState does not define — cannot change the sum.
  */
class RunningTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, RunEvent, RunTotals] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var totals: ValueState[RunTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[RunTotals]("totals",
      org.apache.spark.sql.Encoders.product[RunTotals], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[RunEvent],
                               tv: TimerValues): Iterator[RunTotals] = {
    var st = if (totals.exists()) totals.get() else RunTotals(key, 0L, 0L)
    for (r <- rows) {
      val cents = (BigDecimal(r.value)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
      st = RunTotals(key, st.n_events + 1L, st.sum_cents + cents)
    }
    totals.update(st)
    Iterator.single(st)
  }
}

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
        graft.core.Determinism.dsum(col("value"), 18, 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Per-page extraction manifest for the DSv2 paged source: record count
    * + global-id span. Applied identically to the batch scan and the
    * micro-batch stream (batch/stream parity in PagedApiV2Spec). The id is
    * reconstructed from page arithmetic, so the JSON body column is never
    * requested and the source's column pruning keeps it unbuilt.
    */
  def pagedIngestAgg(pages: DataFrame, pageSize: Int = 100): DataFrame =
    pages.select(col("page"),
        (col("page") * pageSize + col("record_idx")).as("id"))
      .groupBy(col("page"))
      .agg(count(lit(1)).as("n_records"),
        min(col("id")).as("id_lo"), max(col("id")).as("id_hi"))

  /** Per-window leaderboard size for [[rankWindows]]. */
  val TopKPerWindow = 3

  /** Finishing rank for a windowed aggregate: the top-[[TopKPerWindow]]
    * event types per window by count (ties by sum then name — fully
    * deterministic). Window functions are not allowed ON a stream, so the
    * streaming deployment applies this per closed micro-batch result
    * (foreachBatch / on the sink table) while the STATEFUL part — the
    * windowed aggregation — runs on the stream exactly as in [[windowAgg]];
    * the parity spec drives that very split. The rank input is
    * window×type-sized (never event-proportional), so this step is cheap
    * at any scale.
    */
  def rankWindows(agged: DataFrame, k: Int = TopKPerWindow): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("win_start"))
      .orderBy(col("n_events").desc, col("sum_value").desc, col("event_type"))
    agged.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("win_start"), col("rank").cast("long").as("rank"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Windowed top-k end to end: [[windowAgg]] (streamable, stateful)
    * composed with [[rankWindows]] (batch finishing step).
    */
  def windowTopK(events: DataFrame, withWatermark: Boolean): DataFrame =
    rankWindows(windowAgg(events, withWatermark))

  /** Volume-anomaly flags over closed windows: per event type, windows
    * whose count deviates more than 2σ from the type's mean window count.
    * Same stream/sink split as [[rankWindows]]: the STATEFUL windowed
    * count runs on the stream ([[windowAgg]]), this finishing step runs on
    * the closed result (window×type-sized — cheap at any scale, and the
    * per-type baseline is a broadcast). Determinism is engineered the
    * integer way: with s1 = Σn, s2 = Σn², nw = #windows per type,
    * (n − mean)² > (2σ)²  ⇔  (n·nw − s1)² > 4·(s2·nw − s1²) — the flag is
    * decided ENTIRELY in integer arithmetic (no float threshold can
    * flip between engines), and the published z-score reduces to one
    * integer-derived division (n·nw − s1)/√(s2·nw − s1²), rounded r4.
    * Long bounds: safe while window counts stay < ~3e9·√(1/nw) — far
    * beyond any per-30-min event volume this pipeline sees; the exact
    * DECIMAL variant is a one-line swap if a deployment ever nears it.
    */
  def anomalyFlags(agged: DataFrame): DataFrame = {
    val stats = agged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nw"),
        sum(col("n_events")).as("s1"),
        sum(col("n_events") * col("n_events")).as("s2"))
    val dn = col("n_events") * col("nw") - col("s1")           // exact integer
    val varNum = col("s2") * col("nw") - col("s1") * col("s1") // nw³·σ² exact
    // no explicit broadcast hint: the baseline is types-sized, Spark's
    // size estimate broadcasts it on its own, and a hint on this shared
    // subtree breaks self-join reference dedup on memory-sink relations
    agged.join(stats, "event_type")
      .select(col("win_start"), col("event_type"), col("n_events"),
        graft.core.Determinism.r4(
          when(varNum > 0, dn.cast("double") / sqrt(varNum.cast("double")))
            .otherwise(lit(0.0))).as("z"),
        (dn * dn > varNum * 4).as("is_anomaly"))
  }

  /** Windowed volume anomalies end to end: [[windowAgg]] (streamable,
    * stateful) composed with [[anomalyFlags]] (batch finishing step).
    */
  def windowAnomaly(events: DataFrame, withWatermark: Boolean): DataFrame =
    anomalyFlags(windowAgg(events, withWatermark))

  /** Sliding 30-minute window (15-minute slide) counts per event type —
    * each event lands in exactly two overlapping windows. Same
    * batch/stream duality as [[windowAgg]].
    */
  def slidingWindowAgg(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "30 minutes", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.core.Determinism.dsum(col("value"), 18, 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Stream-static enrichment: each event joined to a static dimension and
    * aggregated per (segment, event_type). The standard streaming enrich
    * pattern — the static side is broadcast (re-read per micro-batch, so a
    * slowly-refreshed dim table stays current) and the unbounded stream
    * side is never shuffled for the join; the only stateful operator is
    * the aggregation. Works identically on a batch frame (the driver
    * query/oracle) and a readStream frame (parity in StreamSpec).
    */
  def staticEnrichAgg(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), events("user_id") === dim("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.core.Determinism.dsum(col("value"), 18, 2).as("sum_value"))

  /** Stream-stream interval join: click → purchase attribution. Each click
    * matches the same user's purchases inside [click_ts, click_ts + 30 min].
    * On streams BOTH sides carry a watermark and the join condition bounds
    * event-time distance, so Spark's symmetric hash join can evict state
    * (a purchase older than watermark+30min can never match a future click);
    * in batch it is a plain equi join with a range residual — shuffled on
    * user_id, never a cartesian. Same code both ways (parity in
    * MmStreamSpec).
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      withWatermark: Boolean): DataFrame = {
    def wm(df: DataFrame) =
      if (withWatermark) df.withWatermark("ts", "1 hour") else df
    val c = wm(clicks).select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = wm(purchases).select(col("user_id").as("p_user"),
      col("ts").as("p_ts"), col("value").as("p_value"))
    c.join(p, col("c_user") === col("p_user") &&
      col("p_ts") >= col("c_ts") &&
      col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
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

  /** Streaming incremental upsert: the reference's scheduled extract→upsert
    * load (high-watermark extraction feeding postgres.py:1092-1180's
    * upsert) re-expressed as a Structured Streaming sink. `foreachBatch`
    * is the Spark-first shape for merge sinks: the checkpoint makes each
    * epoch replay-safe, the key-merge itself is idempotent, and the
    * rename-replace swap (TableLifecycle) keeps readers off half-written
    * tables. No stream-side state accumulates — the target table IS the
    * state, so an arbitrarily long-lived ingest stream holds nothing in
    * memory between batches.
    */
  def upsertStream(staging: DataFrame, targetPath: String, keys: Seq[String],
                   checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    staging.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        val spark = batch.sparkSession
        val existing =
          try spark.read.parquet(targetPath)
          catch { // first batch: no target yet — merge into an empty frame
            case _: org.apache.spark.sql.AnalysisException =>
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
          }
        graft.sources.TableLifecycle.renameReplace(
          graft.operators.EtlOps.upsert(existing, batch.toDF(), keys), targetPath)
        ()
      }
      .start()

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

  /** Stateful gap-based sessionization via flatMapGroupsWithState — the
    * custom-state rung of Structured Streaming (beyond what windowed aggs
    * express). State per user is three longs; each micro-batch folds its
    * (sorted) events into the running session count.
    *
    * Semantics note: within one micro-batch events are sorted, but a
    * cross-batch LATE event (event time before the carried last_sec) cannot
    * be re-ordered retroactively — it is folded with a non-positive gap and
    * never regresses `last_sec` (monotonic), so it joins the current
    * session rather than opening a spurious one. Exact batch parity
    * therefore holds when arrival order respects event time at batch
    * granularity (the common file-ingest case; asserted in the spec). True
    * late-data exactness would need event buffering until the watermark —
    * deliberately out of scope for this state-size-bounded operator.
    */
  /** Per-user running totals via [[RunningTotalsProcessor]]. Works on a
    * batch frame (the driver query — transformWithState has a batch
    * execution path) and on a readStream frame (parity in StreamSpec,
    * where the RocksDB state store backs the named state).
    *
    * The returned frame is bound to a conf-cloned session: callers of
    * memory-sink streams read results via `result.sparkSession.table(...)`
    * (the sink's temp view registers in the session that starts the query).
    */
  def runningTotals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    // transformWithState requires the RocksDB state store (the default
    // HDFS-backed provider cannot host named state variables) — in batch
    // AND stream mode. The provider conf is session-level, so the plan is
    // rebound to a conf-cloned session rather than mutating the caller's:
    // an in-place conf.set would silently switch the state-store backend —
    // and hence checkpoint compatibility — of every LATER streaming query
    // in the session (r5 ADVICE).
    val scoped = org.apache.spark.sql.graft.SessionScope.rebindToClone(
      events.toDF(),
      Map("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    val spark = scoped.sparkSession
    import spark.implicits._
    // The StateStoreCoordinator RPC endpoint is registered when the
    // StreamingQueryManager is constructed; a purely-batch session never
    // touches it and RocksDB's executor-side snapshot reporting then fails
    // on the missing endpoint. Touch the manager so batch-mode
    // transformWithState sees the same driver endpoint a stream would.
    spark.streams.active
    scoped.select(col("user_id"), col("value")).as[RunEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "sum_cents")
  }

  /** Watermark drop audit — predicts, at trigger granularity, what
    * Structured Streaming's `numRowsDroppedByWatermark` metric would read
    * for a given delay before the stream is ever deployed. Spark advances
    * the event-time watermark between triggers to max(event time seen) −
    * delay, and stateful operators then drop rows older than it; this
    * replays that exact rule over a batch table whose arrival order is the
    * monotone event_id: batch n's watermark = max event time over batches
    * < n, minus delay (batch 0 has none — everything is on time).
    *
    * Scale shape: the only global window runs over the PER-BATCH maxima —
    * cardinality ∝ number of triggers, not events — and the tiny watermark
    * table broadcasts back onto the events for the per-row classification,
    * so the full-size side never reshuffles beyond the per-batch partial
    * aggregation.
    */
  def lateDataAudit(events: DataFrame, batchSize: Long, delaySec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events.select(expr(s"event_id div $batchSize").as("batch"),
      col("ts").cast("long").as("sec"))
    val perBatch = e.groupBy(col("batch")).agg(max(col("sec")).as("bmax"))
    val w = Window.orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wm = perBatch.select(col("batch"),
      (max(col("bmax")).over(w) - delaySec).as("wm_raw"))
    e.join(broadcast(wm), "batch")
      .groupBy(col("batch"))
      .agg(max(coalesce(col("wm_raw"), lit(-1L))).as("wm_sec"),
        count(lit(1)).as("n_events"),
        sum(when(col("wm_raw").isNotNull && col("sec") < col("wm_raw"), 1L)
          .otherwise(0L)).as("n_late"))
      .orderBy("batch")
  }

  /** Companion to [[lateDataAudit]]: per event-type lateness DISTRIBUTION
    * (how far behind the watermark do this type's rows arrive) — the
    * number that decides whether to widen the delay or drop the data.
    * Same trigger-granularity watermark; late rows measure wm − event_time
    * and the exact interpolated p50/p95 per type come out (−1 when a type
    * is never late). One broadcast of the per-trigger watermark table, one
    * aggregation by type.
    */
  def latenessStats(events: DataFrame, batchSize: Long, delaySec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Determinism.r4
    val e = events.select(col("event_type"),
      expr(s"event_id div $batchSize").as("batch"),
      col("ts").cast("long").as("sec"))
    val perBatch = e.groupBy(col("batch")).agg(max(col("sec")).as("bmax"))
    val w = Window.orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wm = perBatch.select(col("batch"),
      (max(col("bmax")).over(w) - delaySec).as("wm_raw"))
    e.join(broadcast(wm), "batch")
      .withColumn("late_by",
        when(col("wm_raw").isNotNull && col("sec") < col("wm_raw"),
          (col("wm_raw") - col("sec")).cast("double")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("late_by")).as("n_late"),
        coalesce(r4(percentile(col("late_by"), lit(0.5))), lit(-1.0)).as("p50_late_sec"),
        coalesce(r4(percentile(col("late_by"), lit(0.95))), lit(-1.0)).as("p95_late_sec"))
      .orderBy("event_type")
  }

  /** Silent-source detection: per event type, the largest gap between
    * consecutive events and how many gaps exceed the alert threshold — the
    * monitoring query that catches a stalled upstream producer (the
    * heartbeat complement of the lateness audits). One window per type
    * (single shuffle on event_type, lag + max in the same sort); ties on
    * the timestamp break by event_id so the gap sequence is deterministic.
    */
  def heartbeatGaps(events: DataFrame, thresholdSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events.select(col("event_type"), col("event_id"),
      col("ts").cast("long").as("sec"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("sec"), col("event_id"))
    e.withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap_sec"),
        sum(when(col("gap") > thresholdSec, 1L).otherwise(0L)).as("n_gaps_over"))
      .orderBy("event_type")
  }

  def sessionizeStateful(events: DataFrame, gapSec: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("user_id"), col("ts")).as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[SessEvent], state: GroupState[SessState]) => {
          // events within a micro-batch are unordered; sort before folding
          val sorted = evs.toArray.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(SessState(0L, 0L, Long.MinValue))
          for (e <- sorted) {
            val sec = e.ts.getTime / 1000
            val newSession = st.last_sec == Long.MinValue || sec - st.last_sec > gapSec
            st = SessState(st.n_sessions + (if (newSession) 1L else 0L),
              st.n_events + 1L, math.max(st.last_sec, sec)) // never regress on late data
          }
          state.update(st)
          Iterator((uid, st.n_sessions, st.n_events))
        })
      .toDF("user_id", "n_sessions", "n_events")
  }
}
