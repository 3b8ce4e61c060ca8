package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("every relational query returns rows at sf0.001") {
    for ((name, fn) <- Relational.queries) {
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q1 groups are the 2x3 flag/status combinations that exist") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.length >= 3 && rows.length <= 6)
    val qty = rows.map(_.getAs[Double]("sum_qty")).sum
    val n = rows.map(_.getAs[Long]("count_order")).sum
    assert(n == graft.core.Tables.lineitem(spark, sf).count())
    assert(qty > 0)
  }

  test("q3 topk is sorted desc and limited to 10") {
    val rev = Relational.q3TopK(spark, sf).collect().map(_.getAs[Double]("revenue"))
    assert(rev.length == 10)
    assert(rev.sameElements(rev.sortBy(-_)), "not sorted desc")
  }

  test("q4 window keeps at most 3 per segment") {
    val rows = Relational.q4Window(spark, sf).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    assert(bySeg.values.forall(_.length <= 3))
    assert(rows.forall(_.getAs[Int]("rk") <= 3))
  }

  test("q6 plan broadcasts both dims") {
    val plan = Relational.q6BroadcastJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q7 semi + q8 anti partition the customer set w.r.t. their predicates") {
    val c = graft.core.Tables.customer(spark, sf).count()
    val anti = Relational.q8AntiJoin(spark, sf).count()
    assert(anti > 0 && anti <= c)
  }

  test("q13 sessionize: session and event counts are sane") {
    val rows = Relational.q13Sessionize(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("n_sessions") >= 1
      && r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events")))
  }

  test("q5: approx_count_distinct tracks exact within its error bound") {
    // §2 q5 is "approx+exact": the oracle-checked query is exact (HLL
    // sketches aren't engine-portable); the approx path is pinned here.
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables.lineitem(spark, sf)
    val rows = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val e = r.getLong(1).toDouble; val a = r.getLong(2).toDouble
      assert(math.abs(a - e) / e < 0.1, s"approx $a vs exact $e")
    }
  }

  test("q1 parquet scan prunes to the referenced columns") {
    val scan = Relational.q1Agg(spark, sf).queryExecution.executedPlan.toString
    // ReadSchema should not include l_orderkey (unused by q1)
    assert(!scan.contains("l_orderkey"), scan.take(3000))
  }

  test("q22 grouping sets: subtotal levels are consistent") {
    val rows = Relational.queries("q22_grouping_sets")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val total = graft.core.Tables.orders(spark, sf).count()
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(grand.length == 1 && grand.head._4 == total)
    val statusLevel = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    assert(statusLevel.map(_._4).sum == total)
    val leafLevel = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    assert(leafLevel.map(_._4).sum == total)
    // no (ALL, priority) rows: that set is not in the grouping sets list
    assert(!rows.exists(r => r._1 == "ALL" && r._2 != "ALL"))
  }

  test("q23 equals an independently-computed above-avg anti-join set") {
    val c = graft.core.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val ordersByCust = graft.core.Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val pos = c.filter(_._3 > 0.0)
    val avg = pos.map(x => BigDecimal(x._3).setScale(2)).sum / pos.length
    val expected = c.filter { x =>
        BigDecimal(x._3).setScale(2) > avg &&
          !ordersByCust.getOrElse(x._1, Seq.empty).exists(_ > 50.0 * x._3)
      }
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(expected.nonEmpty)
    val got = Relational.queries("q23_anti_above_avg")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("q29 moving avg: RANGE frame matches a driver-side recomputation") {
    val got = Relational.queries("q29_moving_avg")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val ev = graft.core.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts").cast("long"),
        org.apache.spark.sql.functions.col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = ev.groupBy(_._1)
    for ((uid, eid, n, avg) <- got.take(500)) {
      val mine = byUser(uid)
      val sec = mine.find(_._2 == eid).get._3
      val frame = mine.filter(e => e._3 >= sec - 3600 && e._3 <= sec)
      assert(frame.length.toLong == n, s"user $uid event $eid frame size")
      val exact = frame.map(e => BigDecimal(e._4).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / frame.length
      assert(math.abs(avg - exact) < 1e-4, s"user $uid event $eid avg")
    }
  }

  test("q30 ratio-to-report: shares reconstruct each status group's total") {
    val got = Relational.queries("q30_ratio_to_report")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // r4 rounds sub-5e-5 shares to 0, so the floor is inclusive
    assert(got.forall { case (_, _, s) => s >= 0 && s <= 1 })
    val o = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val totals = o.groupBy(_._2).view.mapValues(
      _.map(x => BigDecimal(x._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble).toMap
    for ((k, st, share) <- got.take(500)) {
      val price = o.find(_._1 == k).get._3
      assert(math.abs(share - price / totals(st)) < 1e-4, s"order $k share")
    }
  }

  test("q27 funnel: stage counts shrink monotonically; ordering is strict") {
    val rows = Relational.queries("q27_funnel")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    // a funnel can only narrow
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2)
    assert(rows(0)._3 == 1.0 && rows.forall(_._3 <= 1.0))
    // strictness: a user whose ONLY click precedes every view must not
    // count as stage 2 — recompute stage 2 driver-side and compare
    val ev = graft.core.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("ts").cast("double"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byUser = ev.groupBy(_._1)
    val stage2 = byUser.count { case (_, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      views.nonEmpty && es.exists(e => e._2 == "click" && e._3 > views.min)
    }
    assert(rows(1)._2 == stage2.toLong)
  }

  test("q28 retention: offset 0 is every cohort's peak; offsets non-negative") {
    val rows = Relational.queries("q28_retention")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0))
    for ((cohort, offs) <- rows.groupBy(_._1)) {
      val at0 = offs.find(_._2 == 0L)
      // every user is active in their own first week, so offset 0 exists
      // and no later week of that cohort can exceed it
      assert(at0.isDefined, s"cohort $cohort missing offset 0")
      assert(offs.forall(_._3 <= at0.get._3), s"cohort $cohort retention > 100%")
    }
    // cohort users are disjoint: total offset-0 users = distinct users
    val users = graft.core.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.filter(_._2 == 0L).map(_._3).sum == users)
  }
  test("q31 histogram: buckets clamp and reconcile with the table") {
    val rows = graft.queries.Relational.queries("q31_histogram")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (b, _, _) =>
      b >= 0 && b < graft.queries.Relational.HistBuckets })
    val orders = graft.core.Tables.orders(spark, sf)
      .select("o_totalprice").collect().map(_.getDouble(0))
    assert(rows.map(_._2).sum == orders.length.toLong)
    // driver-side recomputation of one bucket's count
    val w = graft.queries.Relational.HistWidth
    val last = graft.queries.Relational.HistBuckets - 1
    val byBucket = orders.groupBy(p => math.min(math.floor(p / w).toInt, last))
      .view.mapValues(_.length.toLong).toMap
    assert(rows.forall { case (b, n, _) => byBucket(b) == n })
  }

  test("q32 corr: bounded, deterministic, matches driver-side recomputation") {
    val rows = graft.queries.Relational.queries("q32_corr")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, c) => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 })
    val li = graft.core.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    for ((flag, n, corr) <- rows) {
      val g = li.filter(_._1 == flag)
      assert(g.length.toLong == n)
      val xs = g.map(_._2); val ys = g.map(_._3)
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val ref = cov / math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum
        * ys.map(y => (y - my) * (y - my)).sum)
      assert(math.abs(corr - ref) < 1e-6, s"$flag: $corr vs $ref")
    }
  }
  test("q33 concurrency: peak matches a driver-side sweep for one partition") {
    val rows = graft.queries.Relational.queries("q33_concurrency")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall { case (peak, n) => peak >= 1 && peak <= n })
    // recompute the busiest (type, day) exactly
    val ((typ, day), (peak, _)) = rows.maxBy(_._2._1)
    val span = graft.queries.Relational.ConcurrencySpanSec
    val secs = graft.core.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd").as("day"),
        org.apache.spark.sql.functions.col("ts").cast("long"))
      .collect().filter(r => r.getString(0) == typ && r.getString(1) == day)
      .map(_.getLong(2))
    val pts = (secs.map(s => (s, 1)) ++ secs.map(s => (s + span, -1)))
      .sortBy(t => (t._1, t._2))
    var cur = 0L; var best = 0L
    for ((_, d) <- pts) { cur += d; best = math.max(best, cur) }
    assert(peak == best, s"($typ,$day): $peak vs swept $best")
  }
  test("q34 gini: bounded, deterministic, matches driver-side recomputation") {
    val rows = graft.queries.Relational.queries("q34_gini")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, g) => g >= 0.0 - 1e-9 && g < 1.0 })
    val o = graft.core.Tables.orders(spark, sf)
      .select("o_orderstatus", "o_totalprice", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    for ((st, n, gini) <- rows) {
      val xs = o.filter(_._1 == st).sortBy(t => (t._2, t._3)).map(_._2)
      assert(n == xs.length.toLong)
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val ref = 2.0 * six / (xs.length * sx) - (xs.length + 1.0) / xs.length
      assert(math.abs(gini - ref) < 1e-4, s"$st: $gini vs $ref")
    }
  }

  test("q35 attribution: first and last roles credit the same conversions") {
    // a conversion segment has a first touch iff it has a last touch, so
    // the two roles must agree on total conversions credited and revenue
    val rows = graft.queries.Relational.q35Attribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSet.subsetOf(Set("view", "click")))
    val first = rows.filter(_._2 == "first")
    val last = rows.filter(_._2 == "last")
    assert(first.map(_._3).sum === last.map(_._3).sum, "conversion counts")
    assert(first.map(_._4).sum === last.map(_._4).sum, "revenue totals")
  }

  test("q36 rfm: cells partition each nation's ordering customers") {
    val cells = graft.queries.Relational.q36Rfm(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(cells.nonEmpty)
    assert(cells.forall(c => Seq(c._2, c._3, c._4).forall(t => t >= 1 && t <= 5)))
    // every ordering customer lands in exactly one cell
    val perNation = cells.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val expected = graft.core.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct()
      .join(graft.core.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perNation === expected)
  }
}
