package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Noise-immune work counters for the bench scale probes.
  *
  * A wall-time probe leg on a shared VM can stall multi-second on identical
  * code (the r6 driver artifact read graph_pagerank_raw's 10× ratio at 14.8
  * where the committed same-code run reads 2.45), so each probe row also
  * carries the COUNT of the query's dominant data-proportional relation at
  * both scales. Counts are deterministic: a count ratio ≈ the data factor
  * certifies linear work regardless of scheduler noise, and the quadratic
  * defect classes the probes guard (corpus-proportional parameterization,
  * uncapped candidate generation) read ~factor² in the COUNT long before
  * the timing leg is trustworthy.
  *
  * Each counter is the query's own work relation, not a proxy: the IVF
  * scanned-candidate set, the LSH candidate pairs, the NND seed pairs, the
  * capped raw edge set, and (for the rewrite-shaped queries) the exact
  * token/line volume the query itself reports per doc.
  */
object ProbeWork {

  private def count1(df: org.apache.spark.sql.DataFrame): Long = df.count()

  private def sumCol(df: org.apache.spark.sql.DataFrame, c: String): Long =
    df.agg(coalesce(sum(col(c)), lit(0L))).head().getLong(0)

  /** (metric label, counter) per probed query. Queries without an entry
    * report only timed legs (their output row count, captured by Bench
    * during timing, already ∝ the data factor).
    */
  val counters: Map[String, (String, (SparkSession, String) => Long)] = Map(
    // scanned (probe, neighbor) candidates — bounded by NPROBE cells/probe
    "ann_ivf" -> (("scanned_candidates",
      (s, d) => count1(graft.queries.Ann.ivfCandidates(s, d)))),
    // LSH banded candidate pairs — the relation the 1.90→2.94 ratio drift
    // needed attributing (VERDICT r6 #4): planted-data growth vs VM noise
    "dedup_minhash_lsh" -> (("candidate_pairs",
      (s, d) => count1(graft.queries.Dedup.minhashLsh(s, d)))),
    // NND seed pairs — the quantity the composite (LSH cell ⊗ sub-ring)
    // seed holds at ~N·8 where raw fixed-count cells would grow N²/64
    "ann_nndescent" -> (("seed_pairs",
      (s, d) => count1(graft.queries.Ann.nndSeedPairs(s, d)))),
    // capped raw edges — the per-iteration join cardinality of the loop
    "graph_pagerank_raw" -> (("capped_edges",
      (s, d) => count1(graft.queries.Graph.rawEdges(s, d)))),
    // exact token volume the query aggregates (its own per-doc n_tokens)
    "sample_dsir" -> (("tokens",
      (s, d) => sumCol(graft.queries.Sampling.dsir(s, d), "n_tokens"))),
    // exact line volume the rewrite explodes (its own per-doc n_lines)
    "text_line_dedup" -> (("lines",
      (s, d) => sumCol(graft.queries.Text.lineDedup(s, d), "n_lines"))),
    // relational/ETL anchors: input-side cardinality of the scanned fact
    // table (their outputs are constant-size aggregates, so output rows
    // carry no scale signal)
    "q1_agg" -> (("lineitem_rows",
      (s, d) => count1(graft.core.Tables.lineitem(s, d)))),
    "q3_topk" -> (("lineitem_rows",
      (s, d) => count1(graft.core.Tables.lineitem(s, d)))),
    "q18_running_total" -> (("lineitem_rows",
      (s, d) => count1(graft.core.Tables.lineitem(s, d)))),
    "asof_join" -> (("event_rows",
      (s, d) => count1(graft.core.Tables.events(s, d)))),
    "etl_cdc_apply" -> (("order_rows",
      (s, d) => count1(graft.core.Tables.orders(s, d)))),
    "etl_profile" -> (("order_rows",
      (s, d) => count1(graft.core.Tables.orders(s, d)))),
    // V2 splits actually OPENED by the pruned day-range read (post static
    // pruning) — the counter that catches a pruning regression as WORK:
    // the day-partitioned layout bounds files per day, so the expected
    // count is 6 at EITHER scale (7 day dirs survive dir pruning for days
    // 10..16, then the ts zone map cuts the boundary day-16 file whose
    // min ts ≥ the range's exclusive end; work_ratio ≈ 1 — pruned scan
    // cost is constant in corpus volume, linear only in the date range);
    // a regression that stops pruning reads ~30 (every day dir)
    "etl_days_prune" -> (("day_splits_opened", (s, d) => {
      graft.sources.v2.StagedReaderFactory.readersCreated.set(0L)
      count1(graft.queries.Ingest.daysPrune(s, d)): Unit
      graft.sources.v2.StagedReaderFactory.readersCreated.get()
    })),
    // V2 splits opened by the RUNTIME-pruned day read (etl_days_dpp: no
    // static ts predicate — the broadcast dim's collected timestamps close
    // day dirs through SupportsRuntimeV2Filtering). The dim covers 3 UTC
    // days at any scale and the day-partitioned write distribution bounds
    // files/day, so the expected count is 3 at both scales (work_ratio
    // ≈ 1 — runtime-pruned scan cost ∝ the dim's days, not the corpus);
    // a regression that stops runtime pruning opens every day dir (~30)
    "etl_days_dpp" -> (("dpp_splits_opened", (s, d) => {
      graft.sources.v2.StagedReaderFactory.readersCreated.set(0L)
      count1(graft.queries.Ingest.daysDpp(s, d)): Unit
      graft.sources.v2.StagedReaderFactory.readersCreated.get()
    })),
    // EXCESS files opened by the zone-mapped price band beyond the
    // zone-map-theoretic minimum, plus 1. The raw opened count wobbles
    // 2↔3 across scales (repartitionByRange boundaries shift with data
    // volume — the r10 driver run read work_ratio 1.5 on identical code),
    // so the probe reports opened − expected + 1 where `expected` is
    // recomputed from the written files' own footers with the scan's
    // blockSurvives: EXACT skipping reads 1 at every scale by
    // construction (work_ratio 1.0), and any regression that opens
    // files the footers exclude raises it
    // files REWRITTEN by a sparse merge-on-read DELETE, plus 1: the DV
    // tier's whole contract is that a sparse delete rewrites NOTHING
    // (it writes one positions file instead), so the expected count is 0
    // and the probe reads 1 at EVERY scale (work_ratio 1.0). A regression
    // that drops the MOR tier back to COW rewrites the band's files and
    // the probe jumps with the file count.
    "etl_delete_vectors" -> (("mor_rewritten_files_plus1", (s, d) => {
      graft.queries.Ingest.morRewrittenFiles(s, d) + 1
    })),
    // data files CHANGED by a partition-spec evolution, plus 1: the
    // metadata-only contract — evolution renames directories and
    // rewrites NOTHING, so the expected count is 0 and the probe reads 1
    // at EVERY scale (work_ratio 1.0). A regression that rewrites the
    // table during evolve jumps with the file count.
    "etl_partition_evolve" -> (("evolve_changed_files_plus1", (s, d) => {
      graft.queries.Ingest.evolveRewrittenFiles(s, d) + 1
    })),
    // pre-existing destination files TOUCHED by one equality-delete
    // upsert wave (plus the deletion vectors it wrote), plus 1: the eq
    // epoch's contract is that it never reads, rewrites, or vectors a
    // destination file — expected 0, probe reads 1 at EVERY scale
    // (work_ratio 1.0). A fallback to the position-delete path writes
    // DVs and the count jumps with the touched buckets. Measured from
    // the file tree, not the code path's own accounting.
    "stream_table_upsert_eq" -> (("eq_dest_files_touched_plus1", (s, d) => {
      graft.queries.Ingest.eqUpsertProbe(s, d)._1 + 1
    })),
    // bytes COPIED or rewritten by a write-audit-publish, plus 1: the
    // publish's contract is pure renames (rename preserves sizes, so
    // bytes(dst after) − bytes(dst before) − bytes(audit) is EXACTLY 0
    // at any scale — work_ratio 1.0). Any copy-based publish breaks the
    // identity by the copied volume. Measured from the file tree.
    "etl_wap_publish" -> (("wap_bytes_copied_plus1", (s, d) => {
      graft.queries.Ingest.wapProbe(s, d)._1 + 1
    })),
    // files OPENED by a change feed over an UNTOUCHED version range, plus
    // 1: the feed's directory classification must read ZERO bytes when
    // the version deltas name no changes — at 10x the table is 10x
    // bigger and the expected count is still 0 (work_ratio 1.0). A
    // regression that diffs unchanged dirs opens the whole table.
    "etl_change_feed" -> (("cdf_untouched_reads_plus1", (s, d) => {
      graft.queries.Ingest.cdfUntouchedReads(s, d) + 1
    })),
    "etl_minmax_skip" -> (("band_excess_opens_plus1", (s, d) => {
      graft.sources.v2.StagedReaderFactory.readersCreated.set(0L)
      count1(graft.queries.Ingest.minmaxSkip(s, d)): Unit
      val opened = graft.sources.v2.StagedReaderFactory.readersCreated.get()
      import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
      val dir = graft.sources.v2.StagedParquet.tableDir(s,
        s"graft_staged.${graft.queries.Ingest.stagedNs(s, d)}.orders_by_price")
      val schemaJson = graft.sources.v2.StagedParquet.readTable(s,
        s"graft_staged.${graft.queries.Ingest.stagedNs(s, d)}.orders_by_price").schema
      val filters = Seq(
        GreaterThanOrEqual("o_totalprice", 150000.0),
        LessThan("o_totalprice", 250000.0))
      val f = new java.io.File(dir)
      val expected = f.listFiles.toSeq
        .filter(x => x.isFile && x.getName.endsWith(".parquet") &&
          !x.getName.startsWith("_"))
        .count(x => graft.sources.v2.StagedScan
          .blockRanges(x.getPath, x.length).exists { case (_, _, b) =>
            graft.sources.v2.StagedScan.blockSurvives(b, schemaJson, filters) })
      (opened - expected) + 1
    })))

  /** SECOND work counter for probes whose wall and work tell different
    * stories (r11 VERDICT #5): etl_delete_vectors pins rewritten-files at
    * 1.0 (scale-invariant) while the find-positions scan grows with the
    * band — this counter carries the matched-positions count (∝ band
    * rows, ~10 at 10×) so the wall growth is attributed, not inferred.
    * Reported by Bench as work2_* beside the primary counter.
    */
  val counters2: Map[String, (String, (SparkSession, String) => Long)] = Map(
    "etl_delete_vectors" -> (("dv_positions_matched",
      (s, d) => graft.queries.Ingest.morProbe(s, d)._2)),
    // the eq wave's published key volume (∝ the wave, ≈10 at 10×) — the
    // wall growth attributed to the epoch's OWN bytes while the primary
    // counter pins destination work at zero
    "stream_table_upsert_eq" -> (("eq_keys_written",
      (s, d) => graft.queries.Ingest.eqUpsertProbe(s, d)._2)),
    // the published audit volume (∝ the corpus, ≈10 at 10×) — the
    // publish's wall is the rename count + this staging write, while the
    // primary counter pins copied bytes at zero
    "etl_wap_publish" -> (("wap_audit_bytes",
      (s, d) => graft.queries.Ingest.wapProbe(s, d)._2)))
}
