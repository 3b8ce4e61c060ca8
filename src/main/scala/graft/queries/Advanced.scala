package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Determinism.{dsum, r4, r4Sql}
import graft.core.Tables._
import graft.functions.HashFunctions._
import graft.operators.{AsofJoin, Skew}

/** Advanced relational operators (SURVEY.md §2 "advanced"): as-of join,
  * range join, exact quantiles, deterministic sampling, salted-skew
  * aggregation, and the stateful-streaming sessionizer's oracle twin.
  */
object Advanced {

  // ---- as-of join: latest purchase at or before each event ----------------
  /** For every non-purchase event, the same user's most recent purchase
    * event at or before it (−1 when the user never purchased yet). The
    * right side is pre-reduced to one row per (user, ts) — (user_id, ts)
    * is unique in the corpus, but the reduction keeps the operator
    * deterministic on any input (see AsofJoin.asofLast's contract).
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val lefts = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val rights = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("p_id"))
    AsofJoin.asofLast(lefts, rights, Seq("user_id"), "ts", "p_ts",
        Seq("p_id", "p_ts"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        coalesce(col("p_id"), lit(-1L)).as("last_purchase_id"),
        coalesce(col("ts").cast("long") - col("p_ts").cast("long"), lit(-1L))
          .as("secs_since_purchase"))
      .orderBy("event_id")
  }

  /** Forward as-of twin of [[asofJoin]]: for every non-purchase event, the
    * same user's NEXT purchase at or after it — time-to-conversion.
    */
  def asofJoinFwd(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val lefts = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val rights = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("p_id"))
    AsofJoin.asofNext(lefts, rights, Seq("user_id"), "ts", "p_ts",
        Seq("p_id", "p_ts"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        coalesce(col("p_id"), lit(-1L)).as("next_purchase_id"),
        coalesce(col("p_ts").cast("long") - col("ts").cast("long"), lit(-1L))
          .as("secs_to_purchase"))
      .orderBy("event_id")
  }

  // ---- range join: events banded into value tiers -------------------------
  private val tierRows = Seq(
    ("bronze", 0.0, 50.0), ("silver", 50.0, 150.0),
    ("gold", 150.0, 300.0), ("platinum", 300.0, 1000.0))

  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tiers = tierRows.toDF("tier", "lo", "hi")
    AsofJoin.rangeJoinBroadcast(events(s, d), tiers, "value", "lo", "hi")
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 18, 2).as("sum_value"))
      .orderBy("tier")
  }

  // ---- exact interpolated percentiles per group ---------------------------
  def percentiles(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li.groupBy(col("l_returnflag"))
      .agg(
        r4(percentile(col("l_extendedprice"), lit(0.5))).as("p50"),
        r4(percentile(col("l_extendedprice"), lit(0.95))).as("p95"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  // ---- deterministic hash sample (reproducible at any scale) --------------
  /** 5% sample of orders keyed on a salted content hash: the same rows are
    * selected on every run, every engine, every cluster size — the property
    * `df.sample()` (seeded per-partition-split) cannot give.
    */
  def hashSample(s: SparkSession, d: String): DataFrame =
    graft.operators.EtlOps.hashSample(
        orders(s, d), concat(lit("smp:"), col("o_orderkey")), 5)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")

  // ---- salted two-phase aggregation (skew-proof, exact) -------------------
  def skewSaltedAgg(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    Skew.saltedAgg(li, Seq("l_returnflag"), buckets = 8, aggs = Map(
      "n_rows" -> (count(lit(1)), (c: Column) => sum(c)),
      "sum_qty" -> (sum(col("l_quantity").cast("decimal(28,6)")),
        (c: Column) => sum(c).cast("double"))))
      .orderBy("l_returnflag")
  }

  // ---- salted join (replicate-and-salt, for skew AQE can't fix) -----------
  /** lineitem⋈orders through Skew.saltedJoin (orders replicated over 8 salt
    * buckets, lineitem salted) then aggregated — the oracle is the plain
    * join, proving replicate-and-salt changes the physical distribution,
    * never the result.
    */
  def skewSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    Skew.saltedJoin(li, o, Seq("l_orderkey"), buckets = 8)
      .groupBy(col("o_orderstatus"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("o_orderstatus")
  }

  // ---- custom physical operator: bounded-heap per-key top-k ---------------
  /** Top-3 events per user by value — via the TopKPerKeyPlan custom
    * LogicalPlan/SparkStrategy/SparkPlan (rung (c) of the extension
    * ladder): partial bounded heaps before the shuffle, so only
    * O(users·k) rows cross the exchange and nothing is ever sorted.
    * The oracle is the window-rank formulation it replaces.
    */
  def topkPerKey(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), col("event_id"), col("value"))
    graft.plans.TopK.perKey(e, Seq("user_id"),
        Seq(col("value").desc, col("event_id").asc), 3)
      .orderBy(col("user_id"), col("value").desc, col("event_id"))
  }

  // ---- optimizer rule: window top-k rewritten to the bounded-heap plan ----
  /** Top-2 orders per customer by price — written as the PLAIN
    * row_number-window formulation a user would write. The
    * [[graft.plans.WindowTopKRewrite]] optimizer rule (injected through
    * GraftExtensions) replaces the window+filter with TopKPerKeyPlan, so
    * this runs as partial+final bounded heaps with no per-key sort;
    * PlanSpec pins the rewritten physical shape. The order (price desc,
    * orderkey) is total per key, so the rewrite is result-identical.
    */
  def topkRewrite(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // ---- stateful sessionizer, oracle-checked -------------------------------
  /** The flatMapGroupsWithState sessionizer run in batch mode (identical
    * code path to the stream; readStream parity is pinned in StreamSpec) —
    * giving the custom-state operator the same DuckDB oracle as q13.
    */
  def streamSessionize(s: SparkSession, d: String): DataFrame =
    graft.streaming.Streams.sessionizeStateful(events(s, d), gapSec = 1800L)
      .orderBy("user_id")

  /** Spark 4 transformWithState running totals in batch mode (same code
    * path as the stream; RocksDB-backed readStream parity in StreamSpec),
    * oracle = one GROUP BY with the identical cent-exact arithmetic.
    */
  def streamRunningTotals(s: SparkSession, d: String): DataFrame =
    graft.streaming.Streams.runningTotals(events(s, d))
      .orderBy("user_id")

  // ---- custom bitmap-distinct aggregate, oracle-checked -------------------
  /** Distinct users per event type via the [[graft.plans.BitmapDistinct]]
    * TypedImperativeAggregate: per-partition bitmaps OR-merge across one
    * exchange (maxId/8 bytes per group per partition crosses the network,
    * however many rows each partition saw) and the result is EXACT — gated
    * against DuckDB's count(DISTINCT). The SQL registration
    * (`graft_distinct_bitmap`) is exercised in the spec.
    */
  def bitmapDistinctUsers(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(graft.plans.BitmapDistinct.distinctCount(col("user_id"), 1 << 21)
        .as("n_users"))
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_bitmap_distinct" -> (bitmapDistinctUsers _),
    "asof_join"         -> (asofJoin _),
    "asof_join_fwd"     -> (asofJoinFwd _),
    "range_join"        -> (rangeJoin _),
    "q15_percentile"    -> (percentiles _),
    "etl_hash_sample"   -> (hashSample _),
    "skew_salted_agg"   -> (skewSaltedAgg _),
    "skew_salted_join"  -> (skewSaltedJoin _),
    "q16_topk_perkey"   -> (topkPerKey _),
    "q21_topk_rewrite"  -> (topkRewrite _),
    "stream_sessionize" -> (streamSessionize _),
    "stream_running_totals" -> (streamRunningTotals _)
  )

  val oracles: Map[String, String] = Map(
    "q24_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1 ORDER BY 1""",
    "asof_join" ->
      """WITH lefts AS (
           SELECT event_id, user_id, ts, event_type FROM events
           WHERE event_type <> 'purchase'),
         rights AS (
           SELECT user_id, ts AS p_ts, max(event_id) AS p_id FROM events
           WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT l.event_id, l.user_id, l.event_type,
           coalesce(r.p_id, -1) AS last_purchase_id,
           coalesce(CAST(floor(epoch(l.ts)) AS BIGINT)
                    - CAST(floor(epoch(r.p_ts)) AS BIGINT), -1)
             AS secs_since_purchase
         FROM lefts l ASOF LEFT JOIN rights r
           ON l.user_id = r.user_id AND r.p_ts <= l.ts
         ORDER BY event_id""",
    "asof_join_fwd" ->
      """WITH lefts AS (
           SELECT event_id, user_id, ts, event_type FROM events
           WHERE event_type <> 'purchase'),
         rights AS (
           SELECT user_id, ts AS p_ts, max(event_id) AS p_id FROM events
           WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT l.event_id, l.user_id, l.event_type,
           coalesce(r.p_id, -1) AS next_purchase_id,
           coalesce(CAST(floor(epoch(r.p_ts)) AS BIGINT)
                    - CAST(floor(epoch(l.ts)) AS BIGINT), -1)
             AS secs_to_purchase
         FROM lefts l ASOF LEFT JOIN rights r
           ON l.user_id = r.user_id AND l.ts <= r.p_ts
         ORDER BY event_id""",
    "range_join" ->
      """WITH tiers(tier, lo, hi) AS (VALUES
           ('bronze', 0.0, 50.0), ('silver', 50.0, 150.0),
           ('gold', 150.0, 300.0), ('platinum', 300.0, 1000.0))
         SELECT tier, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events JOIN tiers ON value >= lo AND value < hi
         GROUP BY 1 ORDER BY 1""",
    "q15_percentile" ->
      s"""SELECT l_returnflag,
         ${r4Sql("quantile_cont(l_extendedprice, 0.5)")} AS p50,
         ${r4Sql("quantile_cont(l_extendedprice, 0.95)")} AS p95,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "etl_hash_sample" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE ${md5LongSql("concat('smp:', o_orderkey)")} % 100 < 5
         ORDER BY o_orderkey""",
    "skew_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
         CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "skew_salted_join" ->
      """SELECT o_orderstatus,
         CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",
    "q16_topk_perkey" ->
      """SELECT user_id, event_id, value FROM (
           SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rk
           FROM events) WHERE rk <= 3
         ORDER BY user_id, value DESC, event_id""",
    "q21_topk_rewrite" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) WHERE rk <= 2
         ORDER BY o_custkey, o_orderkey""",
    "stream_sessionize" -> Relational.oracles("q13_sessionize"),
    "stream_running_totals" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
             AS sum_cents
         FROM events GROUP BY user_id ORDER BY user_id"""
  )
}
