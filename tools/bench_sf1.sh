#!/usr/bin/env bash
# Standing sf1 (10x) scale gate — VERDICT r7 task #5.
#
# Runs the heavy family at data/sf1 with the same median-of-3 protocol
# as the sf0.1 record and writes BENCH_sf1.json (committed per round, so
# scale regressions can't land silently). Rebuilds the gitignored sf1
# fixture first if absent, then clears stored artifacts keyed to it
# (stale-index guard from the round-7 rehearsal).
#
# Usage: bash tools/bench_sf1.sh   (from /root/repo; ~6 min)
set -euo pipefail
cd "$(dirname "$0")/.."

if [ ! -d data/sf1/documents.parquet ]; then
  echo "[bench_sf1] building data/sf1 fixture (10x sf0.1)"
  rm -rf spark-warehouse/graft_*_root_repo_data_sf1* \
         spark-warehouse/graft_*__root_repo_data_sf1* 2>/dev/null || true
  sbt -batch "runMain graft.util.ScaleUp /root/testdata/sf0.1 data/sf1 10"
fi

# The heavy family: every query the sf1 rehearsals identified as
# scale-sensitive (dedup/LSH pipeline, graph loops, ANN tiers, the e2e
# docs pipeline) — wall seconds AND shuffle MB per query land in the
# artifact.
QUERIES=dedup_exact,dedup_minhash_lsh,dedup_clusters_lsh,dedup_incremental_lsh_stored,dedup_survivors,graph_pagerank,graph_pagerank_directed,graph_kcore,sim_brute_topk,sim_ann_ivf,emb_knn_classifier_ann,text_textrank_keywords,text_tfidf,docs_bm25_topk,docs_pipeline_e2e,text_bpe_train

SPARK_GRAFT_SF_DIR=data/sf1 \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_REPS=${SPARK_GRAFT_BENCH_REPS:-3} \
SPARK_GRAFT_QUERIES="$QUERIES" \
SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || true

python3 - <<'EOF'
import json
d = json.load(open("BENCH_sf1.json"))
print(f"[bench_sf1] total {d['value']:.1f}s over {len(d['queries'])} queries, "
      f"failed={d['failed']}, timed_builds={d['timed_artifact_builds']}")
for q, s in sorted(d["queries"].items(), key=lambda kv: -kv[1]):
    print(f"  {q:32s} {s:7.2f}s  shuffle {d['shuffle_mb'][q]:8.1f} MB")
EOF
