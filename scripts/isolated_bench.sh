#!/usr/bin/env bash
# Standing isolated-reps re-measure (VERDICT r19 #3, generalizing the r18
# bm25_topk_batch protocol): quiet reps=5 for the round's top-task_ms
# entries plus two cheap single-lookup CONTROLS, committed as
# bench_isolated.json. When a driver round shows an entry drifting, this
# artifact (stamped with load1 + commit) turns the ambient-vs-structural
# question into a file read: if the controls moved in band and the entry's
# committed quiet number is flat at the same commit, the drift is the
# driver's environment, not the plan.
#
# Usage: scripts/isolated_bench.sh [sfDir]
#   FAMILY=a,b  subset (default: r19's five heaviest driver entries + controls)
#   OUT=path    artifact (default bench_isolated.json)
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.1}"
# Top-5 task_ms on the driver's last graded artifact (BENCH_r19) +
# ql_dockey_or / s1_keyword_leaf as the cheap controls. Refresh the list
# each round from the new BENCH_r{N} before the round's final commit.
# r21 additions (VERDICT r20 #5): the stream-heavy entries whose driver
# sf0.01 verify counters showed 20-49x task_ms inflation at identical
# shapes (micro-batch bring-up under contention) — the quiet isolated
# numbers pre-decide the next streaming drift call from a file read.
FAMILY="${FAMILY:-decontaminate_fuzzy,source_overlap,dedup_simhash,lm_stream_scores,span_dedup,ql_dockey_or,s1_keyword_leaf,dedup_clusters_stream,sketch_hdr_stream,pqr_stream_index,dedup_pairs_stream,shingle_stream_index}"
OUT="${OUT:-bench_isolated.json}"

echo "[isolated] quiet reps=5 over $SF; benching: $FAMILY" >&2
GRAFT_BENCH_ONLY="$FAMILY" GRAFT_BENCH_OUT="$OUT" GRAFT_BENCH_REPS=5 \
  SPARK_GRAFT_SF_DIR="$SF" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | tail -1
echo "[isolated] full-precision artifact: $OUT" >&2
