#!/usr/bin/env bash
# Contended-mode re-measure (VERDICT r13 #6): run a bench subset WHILE a
# background scan load occupies the machine, instead of quiet isolation.
# Three driver rounds showed the multi-action CC/CORRELATE family inflating
# 5-20x under the driver's load while quiet reps=5 isolation kept
# "confirming" values the driver never reproduced — so ambient-vs-structural
# claims must come from a loaded-machine measurement. Default subset = that
# family; artifact = bench_contended.json (commit it beside bench_last.json).
#
# Usage: scripts/contended_bench.sh [sfDir]
#   LOAD=8      background scanner processes (default 8)
#   FAMILY=a,b  bench subset (default: the r13 weak family)
#   OUT=path    bench json artifact (default bench_contended.json)
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.1}"
LOAD="${LOAD:-8}"
# r18 set: the r17 list plus the round's four slowest driver entries
# (dedup_cdc, chunk_cdc, sketch_cms_stream, dsir_weights — VERDICT r17 #5;
# cms_stream/dsir were already covered), the new CDC store lifecycle
# (cdc_stream_index, cdc_compact), and ql_dockey_or (a cheap single-lookup
# CONTROL: if the control inflates too, the drift is ambient, not
# structural — ADVICE r18 asked the rationale to name it).
# r19 additions (VERDICT r18 #2): the r18 tail the artifact predated —
# the HDR sketch family, mm_phash_near, source_overlap, ts_anomaly,
# ivf_balance, ingest_jsonl, bpe_fertility, the new compactions — plus
# this round's cdc_cut and the mm_phash cluster lifecycle, so the next
# ambient-vs-structural call is pre-decided for every current family.
# Late-r19 additions: the fuzzy-decontamination pair (live probe + stored
# pair-graph serving), the funnel attrition reports (corpus-wide and
# by-source), ngram_novelty, the decontamination removal verb, the two
# IVF audits (emb_outliers, ivf_drift), and ts_seasonal.
# r20 additions (VERDICT r19 #2): every remaining >=1s-quiet entry the
# artifact predated — dedup_simhash (the one r19 3.2x drift with no
# pre-decided arbiter), dedup_winnow, lm_stream_scores, j1_or,
# merge_union, ql_theta_query — so the next ambient-vs-structural call
# is pre-decided for the whole >=1s tail.
# r21 additions (VERDICT r20 #4): every entry that exceeded 2x
# driver-vs-committed in BENCH_r20 — they drift from BELOW the old
# ">=1s quiet" family rule, so the rule missed them: hardneg_mine (2.1x,
# not covered anywhere), ev_stream_left_join, ev_user_profile,
# ingest_pct_derive, q10_returned, ann_recall_planted, j3_subtract,
# j5_order_by.
FAMILY="${FAMILY:-correlate_full,correlate_logodds,correlate_leakage_one,join_salted,bm25_topk_batch,rrf_stored_batch,decontaminate_bloom,tfidf_topterms,pipeline_clean_corpus,span_dedup,span_dedup_stored,dedup_minhash,bm25_topk_filtered_batch,bm25_stored_filtered_batch,rrf_stored_filtered_batch,ann_masked_serve,rrf_stored_filtered_masked,dedup_semantic_real,range_join_days,dsir_weights,dsir_select,dsir_stored,sample_pareto,pipeline_curate,quality_stored,mixture_token_budget,pqr_topk_batch,pqr_topk_filtered,emb_topk_lsh_mp_batch,mm_phash_dedup,decontaminate_report,mixture_epochs,sample_weighted,bpe_doc_tokens,bpe_encode,quality_hostrank,pack_lpt,mm_audio_trim,mixture_curriculum,sketch_kmv,sketch_hll,sketch_cms,sketch_hll_rolling,sketch_cms_stream,sketch_kmv_setops,ppl_kn,ppl_kn_mod,pipeline_release,emb_topk_proj,ts_ewma,dedup_cdc,chunk_cdc,cdc_stream_index,cdc_compact,ql_dockey_or,sketch_hdr,sketch_hdr_stream,sketch_hdr_stored,sketch_hdr_daily,sketch_hdr_rolling,sketch_hdr_compact,sketch_hdr_gate,sketch_hll_compact,mm_phash_near,source_overlap,ts_anomaly,ivf_balance,ingest_jsonl,bpe_fertility,cdc_cut,mm_phash_clusters,mm_phash_removal,mm_phash_keep_best,decontaminate_fuzzy,decontaminate_fuzzy_stored,pipeline_funnel,ngram_novelty,pipeline_funnel_by_source,decontaminate_removal,emb_outliers,ivf_drift,ts_seasonal,dedup_containment,containment_removal,text_langid_confusion,dedup_simhash,dedup_winnow,lm_stream_scores,j1_or,merge_union,ql_theta_query,hardneg_mine,ev_stream_left_join,ev_user_profile,ingest_pct_derive,q10_returned,ann_recall_planted,j3_subtract,j5_order_by}"
OUT="${OUT:-bench_contended.json}"

# Background load: LOAD python workers repeatedly full-reading every parquet
# table in the sf dir (pandas materializes all columns -> genuine IO + CPU +
# allocator pressure, the driver-environment shape quiet isolation lacks).
PIDS=()
for _ in $(seq 1 "$LOAD"); do
  python3 - "$SF" <<'EOF' &
import sys, time, glob
import pandas as pd
deadline = time.time() + 3600
while time.time() < deadline:
    for f in sorted(glob.glob(sys.argv[1] + "/*.parquet")):
        try:
            df = pd.read_parquet(f)
            _ = int(df.memory_usage(deep=False).sum())
            del df
        except Exception:
            pass
EOF
  PIDS+=("$!")
done
trap 'kill "${PIDS[@]}" 2>/dev/null || true; wait 2>/dev/null || true' EXIT

echo "[contended] load=$LOAD workers over $SF; benching: $FAMILY" >&2
GRAFT_BENCH_ONLY="$FAMILY" GRAFT_BENCH_OUT="$OUT" SPARK_GRAFT_SF_DIR="$SF" \
  GRAFT_BENCH_CONTENDED=1 \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | tail -1
echo "[contended] full-precision artifact: $OUT" >&2
