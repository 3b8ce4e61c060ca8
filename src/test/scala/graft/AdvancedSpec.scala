package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, EtlOps}
import graft.queries.Advanced

class AdvancedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofLast: latest right row at or before each left row, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),  // after p100
      (2L, 10L, ts("2024-01-01 00:00:10")),  // exactly at p101 (<= matches)
      (3L, 10L, ts("2024-01-01 00:00:02")),  // before any purchase of 20? no: user 10 @2 after p100@1
      (4L, 20L, ts("2024-01-01 00:00:01"))   // user 20 has no purchases
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:01")),
      (101L, 10L, ts("2024-01-01 00:00:10"))
    ).toDF("p_id", "user_id", "p_ts")
    val out = AsofJoin.asofLast(left, right, Seq("user_id"), "ts", "p_ts",
        Seq("p_id", "p_ts"))
      .select($"event_id", $"p_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(1L -> 100L, 2L -> 101L, 3L -> 100L, 4L -> -1L))
  }

  test("asofNext: earliest right row at or after each left row, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),  // next is p101@10
      (2L, 10L, ts("2024-01-01 00:00:10")),  // exactly at p101 (>= matches)
      (3L, 10L, ts("2024-01-01 00:00:11")),  // after the last purchase -> none
      (4L, 20L, ts("2024-01-01 00:00:01"))   // user 20 has no purchases
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:01")),
      (101L, 10L, ts("2024-01-01 00:00:10"))
    ).toDF("p_id", "user_id", "p_ts")
    val out = AsofJoin.asofNext(left, right, Seq("user_id"), "ts", "p_ts",
        Seq("p_id", "p_ts"))
      .select($"event_id", $"p_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(1L -> 101L, 2L -> 101L, 3L -> -1L, 4L -> -1L))
    // a NULL left timestamp must NOT grab the whole following frame
    val nullLeft = Seq((5L, Option.empty[java.sql.Timestamp], 10L))
      .toDF("event_id", "ts", "user_id")
      .select($"event_id", $"user_id", $"ts")
    val nOut = AsofJoin.asofNext(nullLeft, right, Seq("user_id"), "ts", "p_ts",
        Seq("p_id")).select($"p_id").collect()
    assert(nOut.length == 1 && nOut.head.isNullAt(0),
      "NULL left ts must yield NULL payload")
  }

  test("asofLast plan contains no join: union + one window, single shuffle") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:05"))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 10L, ts("2024-01-01 00:00:01"))).toDF("p_id", "user_id", "p_ts")
    val plan = AsofJoin.asofLast(left, right, Seq("user_id"), "ts", "p_ts",
      Seq("p_id")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected a window pass:\n$plan")
  }

  test("rangeJoinBroadcast: boundary values land in the right band") {
    val fact = Seq((1L, 0.0), (2L, 49.999), (3L, 50.0), (4L, 299.999), (5L, 300.0))
      .toDF("id", "value")
    val dim = Seq(("bronze", 0.0, 50.0), ("gold", 150.0, 300.0), ("platinum", 300.0, 1000.0))
      .toDF("tier", "lo", "hi")
    val out = AsofJoin.rangeJoinBroadcast(fact, dim, "value", "lo", "hi")
      .select($"id", $"tier").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "bronze", 2L -> "bronze", 4L -> "gold", 5L -> "platinum"))
    val plan = AsofJoin.rangeJoinBroadcast(fact, dim, "value", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("percentile matches a hand-computed interpolated quantile") {
    // 5 values, p50 -> pos 2 (0-based) = 30; p75 -> pos 3 = 40
    val df = Seq(10.0, 20.0, 30.0, 40.0, 50.0).toDF("x")
    val r = df.agg(
      percentile($"x", lit(0.5)).as("p50"),
      percentile($"x", lit(0.625)).as("p625")).head()
    assert(r.getDouble(0) == 30.0)
    assert(r.getDouble(1) == 35.0) // pos = 0.625*4 = 2.5 -> 30 + 0.5*(40-30)
  }

  test("hashSample is deterministic, a subset, and roughly sized") {
    val o = graft.core.Tables.orders(spark, sf)
    val s1 = EtlOps.hashSample(o, concat(lit("smp:"), $"o_orderkey"), 5)
      .select("o_orderkey").as[Long].collect().toSet
    val s2 = EtlOps.hashSample(o, concat(lit("smp:"), $"o_orderkey"), 5)
      .select("o_orderkey").as[Long].collect().toSet
    assert(s1 == s2)
    val n = o.count()
    assert(s1.size > 0 && s1.size < n * 0.15)
    // pct=100 keeps everything, pct=0 keeps nothing
    assert(EtlOps.hashSample(o, $"o_orderkey".cast("string"), 100).count() == n)
    assert(EtlOps.hashSample(o, $"o_orderkey".cast("string"), 0).count() == 0)
  }

  test("skew_salted_agg equals the plain aggregation") {
    val salted = Advanced.queries("skew_salted_agg")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = graft.core.Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        graft.core.Determinism.dsum($"l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("stream_sessionize (stateful) equals the window-based q13 sessionize") {
    val stateful = Advanced.queries("stream_sessionize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val windowed = graft.queries.Relational.queries("q13_sessionize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stateful == windowed)
  }

  test("asof_join driver query: unmatched events report -1") {
    val out = Advanced.queries("asof_join")(spark, sf)
    val schema = out.schema.fieldNames.toSeq
    assert(schema == Seq("event_id", "user_id", "event_type",
      "last_purchase_id", "secs_since_purchase"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every matched row has a non-negative gap; unmatched rows are -1/-1
    assert(rows.forall { r =>
      val (pid, secs) = (r.getLong(3), r.getLong(4))
      (pid == -1L && secs == -1L) || (pid >= 0L && secs >= 0L)
    })
    assert(rows.exists(_.getLong(3) >= 0L))
  }
}
