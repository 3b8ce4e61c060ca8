package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 paged-API connector: partition-level page pruning, column
  * pruning, full filter enforcement, and the query route.
  */
class PagedApiV2Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def scan(rows: Long, pageSize: Int = 100) =
    spark.read.format("graft.sources.v2.PagedApiSource")
      .option("rows", rows).option("pageSize", pageSize).load()

  test("unfiltered scan plans one partition per page") {
    val df = scan(1000)
    assert(df.rdd.getNumPartitions == 10)
    assert(df.count() == 1000)
    // tail page is partial, not padded
    assert(scan(950).count() == 950)
    assert(scan(950).rdd.getNumPartitions == 10)
    // empty source plans nothing and returns nothing
    assert(scan(0).rdd.getNumPartitions == 0)
    assert(scan(0).count() == 0)
  }

  test("every ProbeWork counter runs and returns positive work at sf0.001") {
    // counters are otherwise exercised only inside Bench, where a throw
    // silently records -1 — this gate keeps them from rotting
    val d = "/root/testdata/sf0.001"
    for ((q, (label, f)) <- graft.tools.ProbeWork.counters) {
      val n = f(spark, d)
      assert(n > 0, s"counter $label for $q returned $n")
    }
  }

  test("page predicates prune planned partitions, not just rows") {
    // >= : only pages 7..9 are PLANNED (a real connector never fetches 0-6)
    val ge = scan(1000).filter(col("page") >= 7)
    assert(ge.rdd.getNumPartitions == 3)
    assert(ge.count() == 300)
    // between: both bounds reach the scan
    val between = scan(1000).filter(col("page") >= 2 && col("page") <= 4)
    assert(between.rdd.getNumPartitions == 3)
    assert(between.count() == 300)
    // equality pins one page
    val eq = scan(1000).filter(col("page") === 5)
    assert(eq.rdd.getNumPartitions == 1)
    assert(eq.count() == 100)
    // strict bounds shift by one page
    val strict = scan(1000).filter(col("page") > 2 && col("page") < 5)
    assert(strict.rdd.getNumPartitions == 2)
    // an unsatisfiable range plans nothing
    assert(scan(1000).filter(col("page") > 99).rdd.getNumPartitions == 0)
    // the pushed range is visible on the physical plan
    assert(ge.queryExecution.executedPlan.toString.contains("PushedPageRange=[7, 9]"))
  }

  test("accepted page filters are fully enforced by pruning (no residual rows)") {
    val df = scan(1000).filter(col("page") >= 7)
    val pages = df.select("page").distinct().collect().map(_.getLong(0)).sorted
    assert(pages.sameElements(Array(7L, 8L, 9L)))
    // a non-page conjunct survives as a residual filter and still applies
    val mixed = scan(1000).filter(col("page") >= 7 && col("record_idx") < 10)
    assert(mixed.rdd.getNumPartitions == 3)
    assert(mixed.count() == 30)
  }

  test("column pruning reaches the scan output") {
    val df = scan(300).select("page", "record_idx")
    val leaf = df.queryExecution.optimizedPlan.collectLeaves().head
    assert(leaf.output.map(_.name) == Seq("page", "record_idx"))
    // and the reader honors the pruned projection
    assert(df.distinct().count() == 300)
  }

  test("record synthesis round-trips through the PagedRecords coercions") {
    val df = scan(250)
      .select(col("page"), col("record_idx"),
        get_json_object(col("record_json"), "$.id").cast("long").as("id"),
        graft.sources.PagedRecords.coercePhone(col("record_json"), "phone")
          .as("phone"))
    val rows = df.collect()
    assert(rows.length == 250)
    assert(rows.forall { r =>
      val id = r.getLong(2)
      id == r.getLong(0) * 100 + r.getInt(1) && r.getString(3) == s"555-$id"
    })
  }

  test("count(*) pushes into the scan and composes with page pruning") {
    val df = scan(1234).groupBy().count()
    assert(df.collect().head.getLong(0) == 1234)
    assert(df.queryExecution.executedPlan.toString
      .contains("PushedAggregate=count(*)"))
    // pruned + counted: only pages 7-12 are planned, each reports its size
    val pruned = scan(1234).filter(col("page") >= 7).groupBy().count()
    assert(pruned.collect().head.getLong(0) == 534)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PushedAggregate=count(*)"))
    // grouped aggregates stay in the engine (scan keeps its row schema)
    val grouped = scan(300).groupBy("page").count()
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("PushedAggregate"))
    assert(grouped.count() == 3)
  }

  test("scan reports manifest statistics and CBO reacts to pruning") {
    // 10M rows x ~76B = ~760MB unpruned: both sides over the 10MB
    // broadcast threshold -> shuffle join. The same scan pruned to one
    // page reports ~7.6KB -> Catalyst broadcasts it. Without
    // SupportsReportStatistics a V2 relation reports the default
    // (effectively infinite) size and the pruned side would shuffle too.
    val big = scan(10000000L)
    val bigPlan = big.join(scan(10000000L), Seq("record_idx"))
      .queryExecution.executedPlan.toString
    assert(!bigPlan.contains("BroadcastHashJoin"), bigPlan.take(1200))
    val pruned = scan(10000000L).filter(col("page") === 5)
    val prunedPlan = pruned.join(scan(10000000L), Seq("record_idx"))
      .queryExecution.executedPlan.toString
    assert(prunedPlan.contains("BroadcastHashJoin"), prunedPlan.take(1200))
    // the numbers themselves are the planner's partition arithmetic
    val stats = pruned.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(100)), stats.toString)
    // option casing is normalized: pageSize/pagesize/PAGESIZE all bind
    val cased = spark.read.format("graft.sources.v2.PagedApiSource")
      .option("ROWS", 250).option("PageSize", 50).load()
    assert(cased.rdd.getNumPartitions == 5 && cased.count() == 250)
  }

  test("micro-batch stream: page-bounded triggers, batch parity") {
    val ckpt = java.nio.file.Files.createTempDirectory("paged_stream_ck").toString
    val stream = spark.readStream.format("graft.sources.v2.PagedApiSource")
      .option("rows", 1000).option("pageSize", 100)
      .option("maxPagesPerTrigger", 2).load()
    val q = graft.streaming.Streams.pagedIngestAgg(stream)
      .writeStream.format("memory").queryName("paged_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("paged_stream").orderBy("page").collect()
      val want = graft.streaming.Streams.pagedIngestAgg(scan(1000))
        .orderBy("page").collect()
      assert(got.length == 10 && got.sameElements(want))
      // rate limit held: every micro-batch admitted at most 2 pages
      val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(sizes.nonEmpty && sizes.forall(_ <= 200) && sizes.sum == 1000)
    } finally q.stop()
  }

  test("checkpoint resume streams only the NEW pages of a grown corpus") {
    val ckpt = java.nio.file.Files.createTempDirectory("paged_resume_ck").toString
    def run(rows: Long, name: String): Long = {
      val stream = spark.readStream.format("graft.sources.v2.PagedApiSource")
        .option("rows", rows).option("pageSize", 100)
        .option("maxPagesPerTrigger", 1).load()
      val q = graft.streaming.Streams.pagedIngestAgg(stream)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        q.recentProgress.map(_.numInputRows).sum
      } finally q.stop()
    }
    // first extract: 5 pages, all read
    assert(run(500, "paged_resume1") == 500)
    assert(spark.table("paged_resume1").count() == 5)
    // nightly re-extract of the grown corpus: offsets resume at page 5,
    // so only pages 5-7 are fetched — while the complete-mode state
    // still carries all 8 pages in the result
    assert(run(800, "paged_resume2") == 300)
    val pages = spark.table("paged_resume2").orderBy("page").collect()
    assert(pages.length == 8)
    assert(pages.map(_.getLong(0)).sameElements(0L until 8L))
  }

  test("query route: etl_paged_api_scan matches first-principles recompute") {
    val d = "/root/testdata/sf0.001"
    val out = graft.queries.Ingest.queries("etl_paged_api_scan")(spark, d)
      .collect()
    val total = graft.core.Tables.customer(spark, d).count()
    val expect = (0L until total).filter(i => i / 100 >= 1 && i / 100 <= 120)
    assert(out.length == expect.size)
    assert(out.zip(expect).forall { case (r, i) =>
      r.getLong(0) == i / 100 && r.getInt(1) == (i % 100).toInt &&
        r.getLong(2) == i && r.getString(3) == s"cust-$i" &&
        r.getString(4) == s"555-$i"
    })
  }
}
