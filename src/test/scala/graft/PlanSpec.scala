package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY.md §3/§5): the optimizations that matter at
  * 100 TB — pushdown, pruning, broadcasts, TakeOrdered, no cartesian blowups
  * — must be visible in the executed plan, not assumed.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q2: date filter is pushed to the orders parquet scan") {
    val p = plan("q2_join_filter")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")
      || p.matches("(?s).*PushedFilters.*o_orderdate.*"), p.take(2000))
  }

  test("q3: top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("q3_topk").contains("TakeOrderedAndProject"))
  }

  test("q7/q8: semi and anti joins stay semi/anti") {
    assert(plan("q7_semi_join").contains("LeftSemi"))
    assert(plan("q8_anti_join").contains("LeftAnti"))
  }

  test("etl_upsert: staged MERGE is anti join + union, no cartesian") {
    // the query route now writes through the V2 staged MERGE and returns
    // the committed table's read-back — a bare scan, no join at all
    val p = plan("etl_upsert")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p.take(1500))
    // the relation the staged write EXECUTES is where the merge plan
    // lives; pin its shape there (the table exists — plan() just ran it)
    val ns = graft.queries.Ingest.stagedNs(spark, sf)
    val m = graft.sources.v2.StagedParquet.mergedRelation(spark,
        s"graft_staged.$ns.orders_prod",
        graft.queries.Etl.stagingOrders(spark, sf), Seq("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(m.contains("LeftAnti") && m.contains("Union"), m.take(1500))
    assert(!m.contains("CartesianProduct"))
  }

  test("etl_enrich_lookup and q6: dims broadcast") {
    assert(plan("etl_enrich_lookup").contains("BroadcastHashJoin"))
    assert(plan("q6_broadcast_join").contains("BroadcastHashJoin"))
  }

  test("ann_bruteforce: probes broadcast; corpus never shuffled for the join") {
    val p = plan("ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("no dedup/ann plan contains a cartesian product") {
    for (q <- Seq("dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
      "dedup_simhash", "dedup_embedding", "ann_lsh"))
      assert(!plan(q).contains("CartesianProduct"), s"$q has a cartesian")
  }

  test("text/geom single-pass queries shuffle only for final ordering") {
    // geom_reproject_poly included: the whole vertex-wise reprojection —
    // tokenize, per-vertex LCC inverse, reassemble — is one in-row
    // projection, so even reprojecting every polygon vertex never shuffles
    for (q <- Seq("text_fingerprint", "text_tokens", "geom_force_2d",
      "geom_point_latlng", "geom_reproject_poly", "mm_binary_meta")) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning"), s"$q shuffles on hash: ${p.take(800)}")
    }
  }

  test("etl_scd2_history: one window node, one hash shuffle (shared sort)") {
    val p = plan("etl_scd2_history")
    assert("(?m)^\\s*[+:]?-?\\s*Window ".r.findAllIn(p).length <= 1
      || p.split("\\bWindow\\b").length - 1 <= 2, p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one hash exchange: ${p.take(1500)}")
  }

  test("q1: aggregation is partial (map-side combine) before the exchange") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(1500))
  }

  test("sample_mixture: pure map-side filter — no shuffle before the coin flip") {
    // the only exchange allowed is the final presentation orderBy
    val p = plan("sample_mixture")
    assert(!p.contains("hashpartitioning"), p.take(1200))
    assert(!p.contains("BroadcastExchange"), p.take(1200))
  }

  test("text_contamination: benchmark set broadcast, corpus side semi-joined") {
    val p = plan("text_contamination")
    assert(p.contains("BroadcastHashJoin LeftSemi".take(18)) &&
      p.contains("LeftSemi"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("stream_interval_join: equi join with range residual, filters pushed") {
    val p = plan("stream_interval_join")
    assert(p.contains("Join") && !p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.matches("(?s).*PushedFilters.*event_type.*"), p.take(2000))
  }

  test("round-7 queries: gopher map-side; ccnet broadcast cutoffs not a window; epoch plan partial-agged") {
    // gopher rules: one codegen'd projection pass — the only exchange is
    // the presentation orderBy (range, not hash)
    val g = plan("text_gopher_rules")
    assert(!g.contains("hashpartitioning") && !g.contains("BroadcastExchange"),
      g.take(1200))
    // ccnet: classification must run against BROADCAST percentile cutoffs —
    // a global ntile window (the naive formulation) would funnel the corpus
    // through one partition
    val c = plan("text_ccnet_bucket")
    assert(!c.contains("Window"),
      s"ccnet must classify via broadcast cutoffs, not a window: ${c.take(1200)}")
    assert(c.contains("Broadcast"), c.take(1200))
    // epoch plan: corpus-side token agg combines map-side; the 1-row total
    // broadcasts back
    val e = plan("sample_epoch_plan")
    assert(e.contains("partial_sum") || e.contains("partial_count"), e.take(1500))
    assert(e.contains("Broadcast") && !e.contains("CartesianProduct"), e.take(1500))
    // incremental-index recall: hash/broadcast joins only
    assert(!plan("ann_recall_incremental").contains("CartesianProduct"))
  }

  test("dedup_minhash_verified: no cartesian; verification joins stay hashed") {
    val p = plan("dedup_minhash_verified")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("windowed round-5 ops never collapse to a single global partition") {
    // sequence packing, batch split and SCD2 all window per shard/entity —
    // a missing partitionBy would compile to Exchange SinglePartition and
    // serialize the whole corpus through one task at 100 TB
    for (q <- Seq("sample_pack", "ago_batch_split", "etl_scd2_history",
      "sample_token_budget", "dedup_substring"))
      assert(!plan(q).contains("SinglePartition"), s"$q has a global window")
  }

  test("q27 funnel: stage joins are keyed, the top-count join broadcasts") {
    val p = plan("q27_funnel")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the 1-row stage-1 count reaches every row via a broadcast, and the
    // per-stage user joins stay hash joins on user_id
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("hashpartitioning(user_id"), p.take(2000))
  }

  test("geom_extent: vertex min/max stay in-row (no explode/generate)") {
    val p = plan("geom_extent")
    assert(!p.contains("Generate"), p.take(1500))
  }

  test("bloom filter: bit set and drop hashes broadcast; corpus text never shuffles") {
    val p = plan("dedup_bloom_filter")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
    // the final per-doc aggregation shuffles doc_id/hash keys only
    assert(!p.matches("(?s).*Exchange hashpartitioning[^\\n]*text.*"),
      "document text crosses an exchange")
  }

  test("dsir: weight table broadcast back onto tokens; no text in exchanges") {
    val p = plan("sample_dsir")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.matches("(?s).*Exchange hashpartitioning[^\\n]*text.*"),
      "document text crosses an exchange")
  }

  test("kmeans step: partial aggregation before the (cell,dim) exchange") {
    val p = plan("ann_kmeans_step")
    // partial_count/partial_sum markers prove map-side combine
    assert(p.contains("partial_count") || p.contains("partial count")
      || p.matches("(?s).*HashAggregate.*partial.*"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("quadkey: one aggregation, no joins at all") {
    val p = plan("geom_quadkey")
    assert(!p.contains("Join"), p.take(1500))
    assert(!p.contains("SinglePartition") || p.contains("TakeOrdered"),
      "tiling must not serialize through one partition")
  }

  test("checksum: partial aggregation; only 60-bit hashes cross the exchange") {
    val p = plan("etl_checksum")
    assert(!p.matches("(?s).*Exchange hashpartitioning[^\\n]*c_name.*"),
      "raw column values cross an exchange")
    assert(!p.contains("CartesianProduct"))
  }

  test("graph queries: iterative joins stay hash/broadcast, never cartesian") {
    for (q <- Seq("graph_pagerank", "graph_triangles")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1200)}")
    }
  }

  test("knn join: probe cells broadcast onto the bucketed corpus") {
    val p = plan("geom_knn_join")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("sharded/windowed new ops never collapse to one partition") {
    // per-shard byte packing and per-type gap scans must keep their
    // partitionBy — a silent global window is the 100 TB failure mode
    for (q <- Seq("mm_shard_manifest", "stream_heartbeat_gaps"))
      assert(!plan(q).contains("SinglePartition"), s"$q has a global window")
  }

  test("fk check: verdicts come from anti joins, not distinct-collect") {
    val p = plan("etl_fk_check")
    assert(p.contains("LeftAnti"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("map-side classifiers stay shuffle-free") {
    // holdout and anonymize are pure projections: any exchange before the
    // final ordering means the classification stopped being map-side
    for (q <- Seq("sample_holdout", "etl_anonymize")) {
      val p = plan(q)
      val body = p.split("TakeOrdered").last // ordering for output is fine
      assert(!body.contains("Exchange hashpartitioning"), s"$q shuffles: ${p.take(1200)}")
    }
  }

  test("collocations/zipf: only the 1-row totals cross a broadcast") {
    for (q <- Seq("text_collocations", "text_zipf_fit"))
      assert(!plan(q).contains("CartesianProduct"), s"$q has a cartesian")
  }

  test("round-8 queries: no cartesians, no global windows, byte math stays map-side") {
    for (q <- Seq("stream_dedup_index", "ann_cell_drift", "sample_dedup_budget")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian: ${p.take(800)}")
      assert(!p.contains("Window") || !p.contains("SinglePartition"),
        s"$q has a global window")
    }
    // the arrival bands BROADCAST against the stored index — the index
    // (corpus-sized at 100 TB) must never shuffle for this join
    assert(plan("stream_dedup_index").contains("BroadcastHashJoin"))
    // header parse is one projection: no exchange before the output order
    val hp = plan("mm_header_parse")
    assert(!hp.split("TakeOrdered").last.contains("Exchange hashpartitioning"),
      hp.take(1200))
  }

  test("round-9 queries: SPJ joins with zero exchanges; BPE/WAV stay cartesian-free") {
    // the storage-partitioned join: the registered query's executed plan
    // must contain NO exchange at all — neither join side shuffles and the
    // partition-key aggregate rides the key-grouped distribution (the
    // final orderBy's range exchange over 25 rows is the one exception)
    val spj = plan("etl_spj_join")
    assert(!spj.contains("Exchange hashpartitioning"),
      s"SPJ shuffled: ${spj.take(2000)}")
    assert(!spj.contains("BroadcastExchange"), spj.take(1500))
    assert(spj.contains("SortMergeJoin") || spj.contains("ShuffledHashJoin"),
      spj.take(1500))
    for (q <- Seq("text_bpe_train", "mm_wav_header", "graph_modularity")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian: ${p.take(800)}")
    }
    // wav parse is one projection pass, no shuffle before the output order
    val wp = plan("mm_wav_header")
    assert(!wp.split("TakeOrdered").last.contains("Exchange hashpartitioning"),
      wp.take(1200))
    // the metadata profile must plan the aggregate INTO the scan: footer
    // counts and row-group stats, zero data pages decoded
    val st = plan("etl_stats_scan")
    assert(st.contains("StagedAggScan"), st.take(1500))
    // the date-range query must close day directories at plan time:
    // days 10..16 of the 30-day corpus (boundary day kept, residual-cut)
    val dp = plan("etl_days_prune")
    assert(dp.contains("partitions=7,"), dp.take(1500))
  }

  test("etl_bucket_join: the bucketed fact-fact join plans with zero exchanges") {
    // bucket(16, custkey) on both sides: the high-cardinality SPJ — no
    // shuffle on either join side, no broadcast escape (merge hint), the
    // segment aggregate above it may shuffle (different key, 5 rows)
    val p = plan("etl_bucket_join")
    assert(p.contains("Join"), s"no join in bucket SPJ plan: ${p.take(2000)}")
    val joinDown = p.substring(p.indexOf("Join"))
    assert(!joinDown.contains("Exchange"),
      s"bucket SPJ shuffled: ${p.take(2000)}")
    assert(!p.contains("BroadcastExchange"), p.take(1500))
  }

  test("etl_minmax_skip: the zone map plans splits only for the predicate's band") {
    val df = SparkEntry.queries("etl_minmax_skip")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the price-band comparisons reach the scan's zone map...
    assert(p.contains("zonemap=[") && p.matches("(?s).*zonemap=\\[[^\\]]*o_totalprice.*"),
      p.take(2000))
    // ...and of the 8 range-clustered files only the band's are opened
    graft.sources.v2.StagedReaderFactory.readersCreated.set(0L)
    df.collect()
    val opened = graft.sources.v2.StagedReaderFactory.readersCreated.get()
    assert(opened >= 1L && opened <= 4L,
      s"expected the [150k,250k) band to open <=4 of 8 files, opened $opened")
  }

  test("etl_days_dpp: day directories close at RUNTIME from the dim's timestamps") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("etl_days_dpp")(spark, sf)
    // the fact scan carries NO static pruning (all 30 day dirs planned) —
    // the dim's collected ts values are the only thing that can narrow it
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"), p.take(2000))
    graft.sources.v2.StagedReaderFactory.readersCreated.set(0L)
    df.collect()
    val opened = graft.sources.v2.StagedReaderFactory.readersCreated.get()
    val lo = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-10T00:00:00Z"))
    val hi = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-13T00:00:00Z"))
    val dimDays = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase" && col("event_id") % 7 === 0
        && col("ts") >= lit(lo) && col("ts") < lit(hi))
      .select(to_date(col("ts"))).distinct().count()
    assert(dimDays > 0 && dimDays <= 3)
    assert(opened == dimDays,
      s"expected runtime day pruning to open $dimDays of 30 day dirs, opened $opened")
  }
}
