package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-layout planning family (etl_zorder_layout / etl_zonemap_prune /
  * etl_compact_bins) + the grid-blocked point-in-polygon join.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  // ---- the ZOrder codegen expression --------------------------------------

  test("ZOrder.interleave matches the per-bit reference formula") {
    def ref(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val samples = Seq(0L, 1L, 2L, 3L, 63L, 64L, 255L, 4095L, 65535L) ++
      (0 until 200).map(i => (i * 2654435761L) % 65536L)
    for (x <- samples.take(30); y <- samples.take(30))
      assert(graft.plans.ZOrder.interleave(x, y) === ref(x, y), s"($x,$y)")
  }

  test("ZOrder is monotone-local: adjacent cells differ in few code bits") {
    // the layout property the expression exists for: a +1 step in either
    // axis moves the code within the same 2^k block for small k
    for (x <- 0L until 64L; y <- 0L until 64L) {
      val z = graft.plans.ZOrder.interleave(x, y)
      assert((z >> 12) === 0L, "6-bit cells must stay within 12 code bits")
      if (x % 2 == 0)
        assert(graft.plans.ZOrder.interleave(x + 1, y) === (z | 1L))
      if (y % 2 == 0)
        assert(graft.plans.ZOrder.interleave(x, y + 1) === (z | 2L))
    }
  }

  test("ZOrder expression evaluates identically interpreted and codegen'd") {
    import spark.implicits._
    val df = (0L until 512L).toDF("i")
      .select(col("i"), (col("i") % 64L).as("x"), (col("i") / 64L).cast("long").as("y"))
    val viaExpr = df.select(graft.plans.ZOrder.zorder(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    val viaEval = df.collect()
      .map(r => graft.plans.ZOrder.interleave(r.getLong(1), r.getLong(2)))
    assert(viaExpr.sameElements(viaEval))
  }

  // ---- z-order layout + zone-map pruning ----------------------------------

  test("zorder files have bounded dual-axis footprints") {
    // each file covers one 256-code block = a 16x16 cell tile, so BOTH
    // spans are <= 16 cells — the property single-column sorting cannot
    // give (its files span the full secondary axis)
    val rows = graft.queries.Layout.zorderLayout(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 16)
    for (r <- rows) {
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 15L)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 15L)
    }
  }

  test("zone-map pruning: z-order layout reads fewer rows for the 2-D band") {
    val rows = graft.queries.Layout.zonemapPrune(spark, sf).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("n_hit"),
         r.getAs[Long]("rows_hit"), r.getAs[Long]("n_match"))).toMap
    val ins = rows("insertion")
    val zo = rows("zorder")
    // both layouts agree on the true match count; hit sets are supersets
    assert(ins._4 === zo._4)
    assert(ins._3 >= ins._4 && zo._3 >= zo._4)
    // the point of the rewrite: the z-order layout scans no more rows.
    // <= (not <) because the margin is a fixture property, not an operator
    // one: a degenerate corpus where every file intersects the band makes
    // both layouts scan everything. A strict separation is still asserted,
    // but on the robust file-count side: a z-order layout that prunes NO
    // files on a 2-D band query would mean the Morton clustering isn't
    // clustering (the current sf0.001 fixture prunes most of them).
    assert(zo._3 <= ins._3,
      s"zorder rows_hit ${zo._3} above insertion ${ins._3}")
    assert(zo._2 < zo._1,
      s"zorder layout pruned no files (${zo._2} of ${zo._1} hit)")
  }

  // ---- compaction bin packing ---------------------------------------------

  test("compaction bins conserve bytes and number contiguously per month") {
    val files = graft.queries.Layout.compactBins(spark, sf).collect()
    val byMonth = files.groupBy(_.getAs[String]("month"))
    for ((_, bins) <- byMonth) {
      val ids = bins.map(_.getAs[Long]("bin_id")).sorted
      assert(ids.head === 0L && ids.sameElements(0L until ids.length),
        "bin ids must be contiguous from 0")
      for (b <- bins)
        assert((b.getAs[Long]("total_bytes") < 2048L) ===
          (b.getAs[Int]("undersized") === 1))
    }
    val binTotal = files.map(_.getAs[Long]("total_bytes")).sum
    val fileTotal = graft.core.Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM"),
        (col("o_orderkey") % 23).cast("long"))
      .agg((lit(200L) + count(lit(1)) * lit(97L)).as("b"))
      .agg(sum("b")).collect().head.getLong(0)
    assert(binTotal === fileTotal, "bin packing must conserve total bytes")
  }

  // ---- point-in-polygon ---------------------------------------------------

  test("grid-blocked PIP join equals the naive bbox theta-join") {
    // the grid is a candidate-generation optimization only: its output
    // must match the unblocked quadratic reference exactly
    import graft.core.Tables._
    val c = customer(spark, sf)
    val k = c("c_custkey").cast("long")
    val polys = c.select(k.as("id"),
      ((k * 7919L) % 1000000L + 2400000L).as("x0"),
      ((k * 104729L) % 300000L + 200000L).as("y0"),
      (k % 50L + 1L).as("w"), (k % 37L + 2L).as("h"),
      (k % 2L === 0L).as("rect"))
    val o = orders(spark, sf)
    val ok = o("o_orderkey").cast("long")
    val ck = o("o_custkey").cast("long")
    val pts = o.select(ok.as("pid"),
      ((ck * 7919L) % 1000000L + 2400000L + ok % 97L - 23L).as("px"),
      ((ck * 104729L) % 300000L + 200000L + ok % 61L - 12L).as("py"))
    val naive = polys.crossJoin(pts).collect().flatMap { r =>
      val (id, x0, y0) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (w, h, rect) = (r.getLong(3), r.getLong(4), r.getBoolean(5))
      val (pid, px, py) = (r.getLong(6), r.getLong(7), r.getLong(8))
      val verts =
        if (rect) Seq((x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h))
        else Seq((x0, y0), (x0 + w, y0), (x0, y0 + h))
      val edges = verts.zip(verts.tail :+ verts.head)
      val nc = edges.count { case ((x1, y1), (x2, y2)) =>
        ((y1 > py) != (y2 > py)) && {
          val lhs = (px - x1) * (y2 - y1)
          val rhs = (py - y1) * (x2 - x1)
          if (y2 > y1) lhs < rhs else lhs > rhs
        }
      }
      if (nc % 2 == 1) Some((id, pid)) else None
    }
    val expected = naive.groupBy(_._1).map { case (id, ps) =>
      (id, ps.length.toLong, ps.map(_._2).min, ps.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.Geom.pipJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "fixture must exercise at least one inside point")
  }

  test("PIP join plan: cell equi-join, never a cartesian product") {
    val p = graft.queries.Geom.pipJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("new windowed queries never collapse to a single global partition") {
    // compact_bins windows per month, attribution per user/conversion,
    // rfm per nation — a missing partitionBy would serialize the corpus
    // through one task at 100 TB (final tiny-result orderBys compile to
    // RangePartitioning, not SinglePartition, so this assertion is exact)
    for (q <- Seq("etl_compact_bins", "q35_attribution", "q36_rfm"))
      assert(!SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString.contains("SinglePartition"),
        s"$q has a global window")
  }
}
