package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables._

/** Relational/analytics core over the TPC-H-ish tables (SURVEY.md §2).
  *
  * Determinism policy for oracle parity (SURVEY.md §4): every floating
  * aggregate goes through an exact DECIMAL sum and is emitted as DOUBLE, so
  * Spark's partition-order-dependent double summation can never disagree
  * with DuckDB's sequential one. Timestamps are emitted as formatted strings.
  * Every ranked output breaks ties on a key column.
  */
object Relational {

  private def dsum(c: Column, prec: Int = 28, scale: Int = 6): Column =
    graft.core.Determinism.dsum(c, prec, scale)

  private def revenue(df: DataFrame): Column =
    df("l_extendedprice") * (lit(1.0) - df("l_discount"))

  // q1: pricing summary — partial-aggregatable groupBy, no shuffle beyond one
  // exchange on (returnflag, linestatus); whole-stage codegen end to end.
  def q1Agg(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li.groupBy(li("l_returnflag"), li("l_linestatus"))
      .agg(
        dsum(li("l_quantity")).as("sum_qty"),
        dsum(li("l_extendedprice")).as("sum_base_price"),
        dsum(revenue(li)).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // q2: fact join with pushed-down date filter; dims broadcast by AQE/size.
  def q2JoinFilter(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val o  = orders(s, d).filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
      && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c  = customer(s, d)
    val n  = nation(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(revenue(li)).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  // q3: top-k — aggregate then TakeOrderedAndProject (no global sort at scale).
  def q3TopK(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li.groupBy(li("l_orderkey"))
      .agg(dsum(revenue(li)).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // q4: ranking window per group, deterministic tie-break.
  def q4Window(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    c.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("rk"))
      .orderBy("c_mktsegment", "rk")
  }

  // q5: exact distinct aggregation (two-phase under the hood).
  def q5Distinct(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li.groupBy(li("l_returnflag"))
      .agg(
        countDistinct(li("l_partkey")).as("n_parts"),
        countDistinct(li("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  // q6: star join — both dims explicitly broadcast; single shuffle for the agg.
  def q6BroadcastJoin(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val n = nation(s, d)
    val r = region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"), dsum(c("c_acctbal")).as("sum_acctbal"))
      .orderBy("r_name")
  }

  // q7: EXISTS — left semi join, never materializes the right side's columns.
  def q7SemiJoin(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val big = orders(s, d).filter(col("o_totalprice") > 300000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  // q8: NOT EXISTS — left anti join (filter applied to the right side
  // before the join, so the anti-join's build input is already pruned).
  def q8AntiJoin(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d).filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  // q9: rollup with labeled subtotal rows (coalesce over grouping nulls).
  def q9Rollup(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li.rollup(li("l_returnflag"), li("l_linestatus"))
      .agg(dsum(li("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n_rows"))
      .orderBy("returnflag", "linestatus")
  }

  // q10: union + exact dedup; dropDuplicates compiles to a hash aggregate.
  def q10UnionDedup(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val b = o.filter(col("o_totalprice") > 200000.0).select(col("o_custkey"))
    a.unionByName(b).dropDuplicates("o_custkey").orderBy("o_custkey")
  }

  // q11: pivot via conditional aggregation — stays in whole-stage codegen
  // (unlike RelationalGroupedDataset.pivot, identical output, oracle-friendly).
  def q11PivotCase(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    def flagQty(f: String) =
      dsum(when(li("l_returnflag") === f, li("l_quantity")).otherwise(lit(0.0)))
    li.groupBy(li("l_linestatus"))
      .agg(flagQty("A").as("qty_a"), flagQty("N").as("qty_n"), flagQty("R").as("qty_r"))
      .orderBy("l_linestatus")
  }

  // q12: event-time bucketing (batch twin of the streaming window agg).
  def q12TimeBucket(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    e.groupBy(date_format(date_trunc("hour", e("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        e("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(e("value"), 18, 2).as("sum_value"))
      .orderBy("hour", "event_type")
  }

  // q13: gap-based sessionization — lag + running sum windows, one shuffle
  // on user_id reused by both window functions.
  def q13Sessionize(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapped = e.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    gapped.groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  // q14: JSON field extraction + grouped aggregation over it.
  def q14JsonExtract(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    e.select(e("event_type"), get_json_object(e("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
      .orderBy("event_type")
  }

  // q17: full cube — every grouping-set combination with labeled subtotals.
  def q17Cube(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li.cube(li("l_returnflag"), li("l_linestatus"))
      .agg(dsum(li("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n_rows"))
      .orderBy("returnflag", "linestatus")
  }

  // q18: per-customer running total — one shuffle on the key, decimal-exact
  // cumulative sum emitted as double (same determinism policy as dsum).
  def q18RunningTotal(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // q19: lead/lag neighbors — both offsets share ONE window (single
  // shuffle + sort on user_id), gaps in whole seconds (epoch-floor parity
  // with the oracle, as in q13).
  def q19LeadLag(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.select(col("user_id"), col("event_id"),
        lag(col("event_id"), 1).over(w).as("prev_event_id"),
        lead(col("event_id"), 1).over(w).as("next_event_id"),
        (col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
          .as("secs_since_prev"))
      .select(col("user_id"), col("event_id"),
        coalesce(col("prev_event_id"), lit(-1L)).as("prev_event_id"),
        coalesce(col("next_event_id"), lit(-1L)).as("next_event_id"),
        coalesce(col("secs_since_prev"), lit(-1L)).as("secs_since_prev"))
      .orderBy("user_id", "event_id")
  }

  // q20: ntile quartiles of customers by balance within segment.
  def q20Ntile(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    c.select(col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).as("quartile"))
      .orderBy("c_mktsegment", "quartile", "c_custkey")
  }

  // q22: explicit grouping sets — the general form rollup/cube specialize;
  // one pass, Expand feeds a single partial-aggregated exchange. Subtotal
  // rows are identified by grouping() — NOT a coalesce sentinel — so a
  // genuine NULL key value can never collapse into the 'ALL' subtotals.
  def q22GroupingSets(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.groupingSets(
        Seq(Seq(o("o_orderstatus"), o("o_orderpriority")),
          Seq(o("o_orderstatus")), Seq.empty),
        o("o_orderstatus"), o("o_orderpriority"))
      .agg(dsum(o("o_totalprice")).as("sum_price"), count(lit(1)).as("n_orders"),
        grouping(o("o_orderstatus")).as("g_status"),
        grouping(o("o_orderpriority")).as("g_priority"))
      .select(
        when(col("g_status") === 1, lit("ALL"))
          .otherwise(col("o_orderstatus")).as("status"),
        when(col("g_priority") === 1, lit("ALL"))
          .otherwise(col("o_orderpriority")).as("priority"),
        col("sum_price"), col("n_orders"))
      .orderBy("status", "priority")
  }

  // q25: the remaining ranking-window family in one pass — percent_rank,
  // cume_dist, first/last value — all sharing ONE window sort (same
  // partition+order ⇒ Spark plans a single Sort+Window). Order is total
  // (balance then key), so every engine agrees on every rank.
  def q25WindowSuite(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c.select(col("c_mktsegment"), col("c_custkey"),
        graft.core.Determinism.r4(percent_rank().over(w)).as("pct_rank"),
        graft.core.Determinism.r4(cume_dist().over(w)).as("cume"),
        first(col("c_custkey")).over(w).as("poorest_key"),
        last(col("c_custkey")).over(wFull).as("richest_key"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  // q26: semi-structured flatten — from_json with an explicit schema, then
  // nested-array posexplode plus struct field extraction, the
  // schema-on-read path a JSON-bearing column takes (q14 covers scalar
  // extraction; this covers nested arrays/structs). The JSON itself is
  // synthesized deterministically so both engines parse identical bytes.
  def q26JsonFlatten(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val j = concat(lit("""{"tags":[""""), col("event_type"), lit("""","t"""),
      (col("event_id") % 5).cast("string"), lit(""""],"meta":{"src":"s"""),
      (col("user_id") % 3).cast("string"), lit("""","v":"""),
      (col("event_id") % 7).cast("string"), lit("}}"))
    val schema = "struct<tags: array<string>, meta: struct<src: string, v: bigint>>"
    val parsed = e.select(col("event_id"), from_json(j, lit(schema)).as("p"))
    parsed.select(col("event_id"),
        posexplode(col("p.tags")).as(Seq("tag_idx", "tag")),
        col("p.meta.src").as("src"), col("p.meta.v").as("v"))
      .select(col("event_id"), col("tag_idx"), col("tag"), col("src"), col("v"))
      .orderBy("event_id", "tag_idx")
  }

  // q23: TPC-H Q22 shape — customers above the average (positive) balance
  // with no order exceeding 50× their balance, per nation. Two subquery
  // decorrelations in one plan: the scalar "average" becomes a 1-row
  // broadcast (comparison rearranged to exact decimal bal·n > Σbal, so no
  // engine ever divides a float), and the correlated non-equi NOT EXISTS
  // becomes a left_anti join on the equi key with the price predicate as
  // the join's residual condition — shuffled on custkey, never a
  // cartesian.
  def q23AntiAboveAvg(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d)
    val stats = c.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("n"))
    c.join(o, c("c_custkey") === o("o_custkey") &&
        o("o_totalprice") > lit(50.0) * c("c_acctbal"), "left_anti")
      .crossJoin(broadcast(stats))
      .filter(col("c_acctbal").cast("decimal(18,2)") * col("n") > col("s"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal"), 18, 2).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  // q27: staged conversion funnel (view → click → purchase) — each stage's
  // entry is the user's earliest qualifying event STRICTLY after their
  // previous stage entry, the product-analytics "ordered funnel". Three
  // aggregates all keyed on user_id: one co-partitioning serves every
  // stage join (AQE reuses the exchange), and only (user_id, ts) pairs
  // shuffle — never props/payload columns.
  def q27Funnel(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val counts = s1.agg(count(lit(1)).as("n_users")).select(lit(1).as("stage"), col("n_users"))
      .unionByName(s2.agg(count(lit(1)).as("n_users")).select(lit(2).as("stage"), col("n_users")))
      .unionByName(s3.agg(count(lit(1)).as("n_users")).select(lit(3).as("stage"), col("n_users")))
    val top = counts.filter(col("stage") === 1)
      .select(col("n_users").as("n_top"))
    counts.crossJoin(broadcast(top))
      .select(col("stage"), col("n_users"),
        graft.core.Determinism.r4(
          col("n_users").cast("double") / col("n_top").cast("double")).as("conv"))
      .orderBy("stage")
  }

  // q28: weekly cohort retention — users bucketed by first-seen week, then
  // (cohort, week_offset) distinct-user counts: the standard retention
  // triangle. date_trunc('week') is ISO-Monday in both engines; offsets are
  // exact 604800-second multiples so integer division is lossless.
  def q28Retention(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    val active = e.distinct()
    active.join(first, "user_id")
      .select(col("cohort"),
        expr("(CAST(wk AS LONG) - CAST(cohort AS LONG)) div 604800")
          .as("week_offset"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("week_offset"), col("n_users"))
      .orderBy("cohort", "week_offset")
  }

  // q29: trailing time-RANGE window (1h moving average per user) — the
  // range-frame window family (RANGE BETWEEN n PRECEDING), distinct from
  // every ROWS-frame op above: the frame is defined by the ORDER-BY value,
  // so same-second peers always aggregate together regardless of row
  // order. Decimal-exact sum / count keeps the average bit-identical
  // across engines whatever order the frame is folded in.
  def q29MovingAvg(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), col("event_id"),
      col("ts").cast("long").as("sec"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-3600L, 0L)
    e.select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_1h"),
        graft.core.Determinism.r4(
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
            / count(lit(1)).over(w))
          .as("avg_1h"))
      .orderBy("user_id", "event_id")
  }

  // q30: ratio-to-report — each order's share of its status group's total.
  // The whole-partition frame (partitionBy, NO orderBy): one shuffle, no
  // sort-for-frame at all; the group total is computed once per partition.
  def q30RatioToReport(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val w = Window.partitionBy(col("o_orderstatus"))
    o.select(col("o_orderkey"), col("o_orderstatus"),
        graft.core.Determinism.r4(
          col("o_totalprice")
            / sum(col("o_totalprice").cast("decimal(28,2)")).over(w).cast("double"))
          .as("share"))
      .orderBy("o_orderkey")
  }

  // q33: sweep-line peak concurrency — "how many 5-minute event intervals
  // overlap at the worst moment, per type and day" (connection/session
  // capacity planning). Classic interval analytics without an interval
  // self-join: each event emits a +1 at its start and a −1 at its end, and
  // a running sum per (type, day) partition — ends sort before starts at
  // the same instant, so touching intervals don't double-count. Both
  // engines use the default RANGE frame, so tied instants share one
  // cumulative value deterministically.
  val ConcurrencySpanSec = 300L

  def q33Concurrency(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("event_type"),
      date_format(col("ts"), "yyyy-MM-dd").as("day"),
      col("ts").cast("long").as("sec"))
    val pts = e.select(col("event_type"), col("day"), col("sec").as("t"), lit(1L).as("delta"))
      .unionAll(e.select(col("event_type"), col("day"),
        (col("sec") + ConcurrencySpanSec).as("t"), lit(-1L).as("delta")))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("t"), col("delta"))
    pts.withColumn("load", sum(col("delta")).over(w))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("load")).as("peak_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_events"))
      .orderBy("event_type", "day")
  }

  // q34: Gini coefficient of order value per status group — the inequality
  // statistic monitoring pipelines track for concentration drift (one
  // customer dominating a segment). Exact rank formula
  // G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted values: the rank
  // is one window per group, both sums accumulate as r4-floored DECIMALs,
  // and doubles appear only in the final scalar — the q32 recipe.
  def q34Gini(s: SparkSession, d: String): DataFrame = {
    def d4(c: Column) = (floor(c * 10000.0 + 0.5) / 10000.0).cast("decimal(38,4)")
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .select(col("o_orderstatus"), col("o_totalprice"),
        row_number().over(w).cast("long").as("i"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(d4(col("o_totalprice"))).cast("double").as("sx"),
        sum(d4(col("i") * col("o_totalprice"))).cast("double").as("six"))
      .select(col("o_orderstatus"), col("n").cast("long").as("n_orders"),
        graft.core.Determinism.r6(
          lit(2.0) * col("six") / (col("n") * col("sx"))
            - (col("n") + 1.0) / col("n")).as("gini"))
      .orderBy("o_orderstatus")
  }

  // q35: first/last-touch revenue attribution — the credit-assignment
  // shape marketing/funnel analytics runs at warehouse scale. Conversions
  // (purchases) split each user's event stream into segments via ONE
  // per-user cumulative window; each touch (view/click) belongs to the
  // segment of the NEXT conversion; per-segment first/last touch comes
  // from two row_number orderings sharing one (user,conversion) window
  // sort. Every window is user- or conversion-partitioned — nothing
  // global — and the touch→conversion join is an equi hash join on
  // (user_id, conv_idx), so the plan is two keyed shuffles however many
  // users there are.
  def q35Attribution(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
    val wSeg = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = e.withColumn("conv_cum",
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(wSeg))
    val conv = seg.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("conv_cum").as("conv_idx"), col("cents"))
    val wF = Window.partitionBy("user_id", "conv_idx")
      .orderBy(col("ts"), col("event_id"))
    val wL = Window.partitionBy("user_id", "conv_idx")
      .orderBy(col("ts").desc, col("event_id").desc)
    val touch = seg.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        (col("conv_cum") + 1L).as("conv_idx"))
      .withColumn("rn_f", row_number().over(wF))
      .withColumn("rn_l", row_number().over(wL))
    val picks = touch.filter(col("rn_f") === 1)
      .select(col("user_id"), col("conv_idx"), col("event_type"), lit("first").as("role"))
      .unionByName(touch.filter(col("rn_l") === 1)
        .select(col("user_id"), col("conv_idx"), col("event_type"), lit("last").as("role")))
    picks.join(conv, Seq("user_id", "conv_idx"))
      .groupBy(col("event_type").as("channel"), col("role"))
      .agg(count(lit(1)).as("n_conv"), sum("cents").as("rev_cents"))
      .orderBy("channel", "role")
  }

  // q36: RFM (recency/frequency/monetary) customer segmentation, the
  // classic warehouse scoring query. Per-customer stats are one groupBy;
  // quintile assignment runs PER NATION (the "within market" formulation),
  // so every ntile window is partitioned — at 100 TB no global sort exists,
  // and the three orderings share one exchange on nationkey. All ties are
  // broken by custkey, making quintile membership engine-portable.
  def q36Rfm(s: SparkSession, d: String): DataFrame = {
    val per = orders(s, d).groupBy(col("o_custkey").as("ck"))
      .agg(datediff(lit("1998-12-31").cast("date"), max(col("o_orderdate")))
          .as("r_days"),
        count(lit(1)).as("freq"),
        sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("cents"))
      .join(customer(s, d).select(col("c_custkey").as("ck"),
        col("c_nationkey").as("nk")), "ck")
    def tile(order: Seq[Column]) =
      ntile(5).over(Window.partitionBy("nk").orderBy(order: _*))
    val scored = per
      .withColumn("r_t", tile(Seq(col("r_days"), col("ck"))))
      .withColumn("f_t", tile(Seq(col("freq").desc, col("ck"))))
      .withColumn("m_t", tile(Seq(col("cents").desc, col("ck"))))
    scored.groupBy("nk", "r_t", "f_t", "m_t")
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("rev_cents"))
      .orderBy("nk", "r_t", "f_t", "m_t")
  }

  // q31: fixed-width value histogram — the profile/monitoring primitive
  // (price distribution drift between loads). Bucket index is pure integer
  // arithmetic, so the whole query is one partially-aggregated groupBy; the
  // tail bucket is clamped so outliers can't fan the key space.
  val HistWidth = 25000.0
  val HistBuckets = 20

  def q31Histogram(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.select(least(floor(col("o_totalprice") / HistWidth),
        lit(HistBuckets - 1L)).cast("int").as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        graft.core.Determinism.dsum(col("o_totalprice"), 18, 2).as("sum_price"))
      .orderBy("bucket")
  }

  // q32: per-group Pearson correlation from EXACT sufficient statistics:
  // the five sums accumulate as r4-floored DECIMALs (order-independent),
  // and only the final scalar formula touches doubles — so both engines
  // compute corr from bit-identical inputs. The same one-pass shape
  // (partial aggregation, five columns) computes covariance/regression
  // slopes at any scale.
  def q32Corr(s: SparkSession, d: String): DataFrame = {
    def d4(c: Column) = (floor(c * 10000.0 + 0.5) / 10000.0).cast("decimal(28,4)")
    val li = lineitem(s, d).select(col("l_returnflag"),
      col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(d4(col("x"))).cast("double").as("sx"),
        sum(d4(col("y"))).cast("double").as("sy"),
        sum(d4(col("x") * col("y"))).cast("double").as("sxy"),
        sum(d4(col("x") * col("x"))).cast("double").as("sxx"),
        sum(d4(col("y") * col("y"))).cast("double").as("syy"))
      .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
        graft.core.Determinism.r6(
          (col("n") * col("sxy") - col("sx") * col("sy"))
            / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              * (col("n") * col("syy") - col("sy") * col("sy")))).as("corr"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_histogram"     -> (q31Histogram _),
    "q33_concurrency"   -> (q33Concurrency _),
    "q34_gini"          -> (q34Gini _),
    "q35_attribution"   -> (q35Attribution _),
    "q36_rfm"           -> (q36Rfm _),
    "q32_corr"          -> (q32Corr _),
    "q29_moving_avg"    -> (q29MovingAvg _),
    "q30_ratio_to_report" -> (q30RatioToReport _),
    "q27_funnel"        -> (q27Funnel _),
    "q28_retention"     -> (q28Retention _),
    "q22_grouping_sets" -> (q22GroupingSets _),
    "q23_anti_above_avg" -> (q23AntiAboveAvg _),
    "q25_window_suite"  -> (q25WindowSuite _),
    "q26_json_flatten"  -> (q26JsonFlatten _),
    "q20_ntile"         -> (q20Ntile _),
    "q19_lead_lag"      -> (q19LeadLag _),
    "q17_cube"          -> (q17Cube _),
    "q18_running_total" -> (q18RunningTotal _),
    "q1_agg"            -> (q1Agg _),
    "q2_join_filter"    -> (q2JoinFilter _),
    "q3_topk"           -> (q3TopK _),
    "q4_window"         -> (q4Window _),
    "q5_distinct"       -> (q5Distinct _),
    "q6_broadcast_join" -> (q6BroadcastJoin _),
    "q7_semi_join"      -> (q7SemiJoin _),
    "q8_anti_join"      -> (q8AntiJoin _),
    "q9_rollup"         -> (q9Rollup _),
    "q10_union_dedup"   -> (q10UnionDedup _),
    "q11_pivot_case"    -> (q11PivotCase _),
    "q12_time_bucket"   -> (q12TimeBucket _),
    "q13_sessionize"    -> (q13Sessionize _),
    "q14_json_extract"  -> (q14JsonExtract _)
  )

  val oracles: Map[String, String] = Map(
    "q36_rfm" ->
      """WITH per AS (SELECT o_custkey AS ck,
             datediff('day', max(o_orderdate), DATE '1998-12-31') AS r_days,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
           FROM orders GROUP BY ck),
         j AS (SELECT p.*, c.c_nationkey AS nk
           FROM per p JOIN customer c ON c.c_custkey = p.ck),
         scored AS (SELECT nk,
             ntile(5) OVER (PARTITION BY nk ORDER BY r_days, ck) AS r_t,
             ntile(5) OVER (PARTITION BY nk ORDER BY freq DESC, ck) AS f_t,
             ntile(5) OVER (PARTITION BY nk ORDER BY cents DESC, ck) AS m_t,
             cents
           FROM j)
         SELECT nk, r_t, f_t, m_t, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS rev_cents
         FROM scored GROUP BY nk, r_t, f_t, m_t
         ORDER BY nk, r_t, f_t, m_t""",
    "q35_attribution" ->
      """WITH e AS (SELECT event_id, ts, user_id, event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events),
         seg AS (SELECT *, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conv_cum
           FROM e),
         conv AS (SELECT user_id, conv_cum AS conv_idx, cents
           FROM seg WHERE event_type = 'purchase'),
         touch AS (SELECT user_id, event_type, ts, event_id,
             conv_cum + 1 AS conv_idx
           FROM seg WHERE event_type IN ('view', 'click')),
         rt AS (SELECT *,
             row_number() OVER (PARTITION BY user_id, conv_idx
               ORDER BY ts, event_id) AS rn_f,
             row_number() OVER (PARTITION BY user_id, conv_idx
               ORDER BY ts DESC, event_id DESC) AS rn_l
           FROM touch),
         picks AS (SELECT user_id, conv_idx, event_type, 'first' AS role
             FROM rt WHERE rn_f = 1
           UNION ALL
           SELECT user_id, conv_idx, event_type, 'last' AS role
             FROM rt WHERE rn_l = 1)
         SELECT p.event_type AS channel, p.role,
           CAST(count(*) AS BIGINT) AS n_conv,
           CAST(sum(c.cents) AS BIGINT) AS rev_cents
         FROM picks p JOIN conv c USING (user_id, conv_idx)
         GROUP BY channel, role ORDER BY channel, role""",
    "q34_gini" -> {
      def d4(e: String) =
        s"CAST(floor(($e) * 10000.0 + 0.5) / 10000.0 AS DECIMAL(38,4))"
      s"""WITH ranked AS (SELECT o_orderstatus, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS i
           FROM orders),
         st AS (SELECT o_orderstatus,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(${d4("o_totalprice")}) AS DOUBLE) AS sx,
             CAST(sum(${d4("i * o_totalprice")}) AS DOUBLE) AS six
           FROM ranked GROUP BY o_orderstatus)
         SELECT o_orderstatus, CAST(n AS BIGINT) AS n_orders,
           ${graft.core.Determinism.r6Sql(
             "2.0 * six / (n * sx) - (n + 1.0) / n")} AS gini
         FROM st ORDER BY o_orderstatus"""
    },
    "q33_concurrency" ->
      s"""WITH e AS (SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
         pts AS (SELECT event_type, day, sec AS t, CAST(1 AS BIGINT) AS delta FROM e
                 UNION ALL
                 SELECT event_type, day, sec + $ConcurrencySpanSec, CAST(-1 AS BIGINT) FROM e),
         run AS (SELECT event_type, day,
             sum(delta) OVER (PARTITION BY event_type, day
                              ORDER BY t, delta) AS load
           FROM pts)
         SELECT event_type, day,
           CAST(max(load) AS BIGINT) AS peak_concurrent,
           CAST(count(*) / 2 AS BIGINT) AS n_events
         FROM run GROUP BY event_type, day ORDER BY event_type, day""",
    "q31_histogram" ->
      s"""SELECT CAST(least(floor(o_totalprice / $HistWidth), ${HistBuckets - 1})
           AS INTEGER) AS bucket,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY bucket ORDER BY bucket""",
    "q32_corr" -> {
      def d4(e: String) =
        s"CAST(floor(($e) * 10000.0 + 0.5) / 10000.0 AS DECIMAL(28,4))"
      s"""WITH st AS (SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(${d4("l_quantity")}) AS DOUBLE) AS sx,
             CAST(sum(${d4("l_extendedprice")}) AS DOUBLE) AS sy,
             CAST(sum(${d4("l_quantity * l_extendedprice")}) AS DOUBLE) AS sxy,
             CAST(sum(${d4("l_quantity * l_quantity")}) AS DOUBLE) AS sxx,
             CAST(sum(${d4("l_extendedprice * l_extendedprice")}) AS DOUBLE) AS syy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           ${graft.core.Determinism.r6Sql(
             "(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))")}
             AS corr
         FROM st ORDER BY l_returnflag"""
    },
    "q29_moving_avg" ->
      s"""WITH e AS (SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events)
         SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           ${graft.core.Determinism.r4Sql(
             "CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / (count(*) OVER w)")} AS avg_1h
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY sec
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",
    "q30_ratio_to_report" ->
      s"""SELECT o_orderkey, o_orderstatus,
           ${graft.core.Determinism.r4Sql(
             "o_totalprice / CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) OVER (PARTITION BY o_orderstatus) AS DOUBLE)")} AS share
         FROM orders ORDER BY o_orderkey""",
    "q27_funnel" ->
      s"""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
             WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
             JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
             WHERE e.event_type = 'click' GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
             JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
             WHERE e.event_type = 'purchase' GROUP BY e.user_id),
         counts AS (
           SELECT 1 AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
           UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM s2
           UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM s3)
         SELECT stage, n_users,
           ${graft.core.Determinism.r4Sql(
             "CAST(n_users AS DOUBLE) / CAST((SELECT n_users FROM counts WHERE stage = 1) AS DOUBLE)")} AS conv
         FROM counts ORDER BY stage""",
    "q28_retention" ->
      """WITH wks AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
         first AS (SELECT user_id, min(wk) AS cohort FROM wks GROUP BY user_id),
         active AS (SELECT DISTINCT user_id, wk FROM wks)
         SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
           (CAST(epoch(a.wk) AS BIGINT) - CAST(epoch(f.cohort) AS BIGINT))
             // 604800 AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
         FROM active a JOIN first f ON f.user_id = a.user_id
         GROUP BY 1, 2 ORDER BY cohort, week_offset""",
    "q22_grouping_sets" ->
      """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                     ELSE o_orderstatus END AS status,
         CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
              ELSE o_orderpriority END AS priority,
         CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
         count(*) AS n_orders
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                 (o_orderstatus), ())
         ORDER BY 1, 2""",
    "q25_window_suite" -> {
      val r4 = graft.core.Determinism.r4Sql _
      s"""SELECT c_mktsegment, c_custkey,
         ${r4("percent_rank() OVER w")} AS pct_rank,
         ${r4("cume_dist() OVER w")} AS cume,
         first_value(c_custkey) OVER w AS poorest_key,
         last_value(c_custkey) OVER (PARTITION BY c_mktsegment
           ORDER BY c_acctbal, c_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_key
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
         ORDER BY c_mktsegment, c_custkey"""
    },
    "q26_json_flatten" ->
      """WITH src AS (SELECT event_id,
           '{"tags":["' || event_type || '","t' || (event_id % 5)
             || '"],"meta":{"src":"s' || (user_id % 3)
             || '","v":' || (event_id % 7) || '}}' AS j
         FROM events)
         SELECT event_id, CAST(i AS INTEGER) AS tag_idx,
           json_extract_string(j, '$.tags[' || i || ']') AS tag,
           json_extract_string(j, '$.meta.src') AS src,
           CAST(json_extract(j, '$.meta.v') AS BIGINT) AS v
         FROM src, UNNEST(range(0, CAST(json_array_length(j, '$.tags') AS BIGINT))) AS t(i)
         ORDER BY event_id, tag_idx""",
    "q23_anti_above_avg" ->
      """WITH stats AS (
           SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS n
           FROM customer WHERE c_acctbal > 0.0)
         SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
         FROM customer, stats
         WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_totalprice > 50.0 * c_acctbal)
         GROUP BY 1 ORDER BY 1""",
    "q20_ntile" ->
      """SELECT c_mktsegment, c_custkey,
         CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal DESC, c_custkey) AS INTEGER)
           AS quartile
         FROM customer ORDER BY c_mktsegment, quartile, c_custkey""",
    "q19_lead_lag" ->
      """SELECT user_id, event_id,
         coalesce(lag(event_id) OVER w, -1) AS prev_event_id,
         coalesce(lead(event_id) OVER w, -1) AS next_event_id,
         coalesce(CAST(floor(epoch(ts)) AS BIGINT)
                  - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT), -1)
           AS secs_since_prev
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, event_id""",
    "q17_cube" ->
      """SELECT coalesce(l_returnflag,'ALL') AS returnflag,
         coalesce(l_linestatus,'ALL') AS linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
         count(*) AS n_rows
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY 1,2""",
    "q18_running_total" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
    "q2_join_filter" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
    "q3_topk" ->
      """SELECT l_orderkey,
         CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
         FROM lineitem GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q4_window" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rk FROM (
           SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rk
           FROM customer) WHERE rk <= 3 ORDER BY c_mktsegment, rk""",
    "q5_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q6_broadcast_join" ->
      """SELECT r_name, count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q7_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
         ORDER BY c_custkey""",
    "q8_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
         ORDER BY c_custkey""",
    "q9_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS returnflag,
         coalesce(l_linestatus,'ALL') AS linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
         count(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY 1,2""",
    "q10_union_dedup" ->
      """SELECT DISTINCT o_custkey FROM (
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
           UNION ALL
           SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
         ORDER BY o_custkey""",
    "q11_pivot_case" ->
      """SELECT l_linestatus,
         CAST(sum(CAST(CASE WHEN l_returnflag='A' THEN l_quantity ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) AS qty_a,
         CAST(sum(CAST(CASE WHEN l_returnflag='N' THEN l_quantity ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) AS qty_n,
         CAST(sum(CAST(CASE WHEN l_returnflag='R' THEN l_quantity ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) AS qty_r
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q12_time_bucket" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         event_type, count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "q13_sessionize" ->
      """WITH gapped AS (
           SELECT user_id,
             CASE WHEN prev_ts IS NULL
                  OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800 THEN 1 ELSE 0 END AS new_sess
           FROM (SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                 FROM events))
         SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
         FROM gapped GROUP BY 1 ORDER BY 1""",
    "q14_json_extract" ->
      """SELECT event_type,
         CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         count(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS n_k
         FROM events GROUP BY 1 ORDER BY 1"""
  )
}
