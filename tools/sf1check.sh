#!/usr/bin/env bash
# sf1 correctness anchor (VERDICT r7 #3): the bench's sf1 section TIMES the
# heavy queries on the genuine 10x corpus; this script HASH-CHECKS them on
# the same corpus against DuckDB — a fourth correctness scale point beyond
# sf0.001/0.01/0.1.
#
# Usage: tools/sf1check.sh [sf_dir] [scale_dir]
# Writes per-query results + verdict to stdout; exit 0 iff all match.
set -u
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
SCALE="${2:-/tmp/graft_scale10x}"
OUT=/tmp/verify_sf1_anchor

# the bench sf1 section's heavy list (Bench.scala `heavies`) — includes the
# round-9 V2 READ trio so the read path's pruning arithmetic hash-checks at
# a second scale (VERDICT r9 #8), plus the round-10 lifecycle rungs
# (compact, DELETE, bucket SPJ, UPDATE, streaming tail)
HEAVY="ann_nndescent,ann_graph_search,ann_recall_gsearch,ann_recall_nnd,graph_pagerank_raw,graph_cosim,graph_cc_raw,dedup_minhash_lsh,dedup_winnowing,etl_profile,etl_cdc_apply,q18_running_total,etl_rename_replace,stream_dedup_index,etl_spj_join,etl_stats_scan,etl_days_prune,etl_days_dpp,etl_compact_files,etl_delete_rows,etl_bucket_join,etl_update_rows,stream_table_tail,stream_table_ingest,etl_time_travel,etl_delete_vectors,etl_change_feed,etl_sort_order,etl_partition_evolve,etl_layout_migrate,etl_meta_partitions,etl_meta_files,etl_meta_history,stream_table_upsert,stream_table_upsert_eq,etl_time_travel_ts,etl_table_tag,etl_wap_publish,etl_rollback"

# a pre-existing dir may have been built from a DIFFERENT sf (the bench
# probe section rebuilds this path from ITS sf dir) — the _source stamp
# pins the corpus to the sf it scales, and a mismatch forces a rebuild
if [ ! -d "$SCALE/orders.parquet" ] || [ "$(cat "$SCALE/_source" 2>/dev/null)" != "$SF" ]; then
  echo "[sf1check] building 10x corpus at $SCALE from $SF"
  rm -rf "$SCALE"
  sbt -batch "runMain graft.tools.ScaleCorpus $SF $SCALE" || exit 1
  echo "$SF" > "$SCALE/_source"
fi

sbt -batch "runMain graft.Verify $SCALE $OUT $HEAVY" || exit 1
python3 tools/check.py "$SCALE" "$OUT" "$HEAVY" || exit 1

# round-13 lifecycle anchors (VERDICT r12 #6): double evolution,
# crash-resume migrate, and a wide (>10k-key) upsert epoch, each
# SELF-CHECKED row-exactly at the same 10x corpus — the three scenarios
# the round-12 hardening touched that the DuckDB-gated list cannot reach
# (they exercise crash windows and counters, not a reproducible relation).
sbt -batch "runMain graft.tools.Sf1Lifecycle $SCALE"
