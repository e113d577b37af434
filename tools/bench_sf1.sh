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
QUERIES=dedup_exact,dedup_minhash_lsh,dedup_minhash_lsh_stored,dedup_clusters_lsh,dedup_incremental_lsh_stored,dedup_survivors,graph_pagerank,graph_pagerank_stored,graph_pagerank_directed,graph_pagerank_directed_stored,graph_kcore,graph_kcore_stored,sim_brute_topk,sim_ann_ivf,sim_ann_ivfpq,sim_ann_ivfpq_stored,sim_ann_ivfpq_residual_stored,mm_decode_jpeg,emb_knn_classifier_ann,text_textrank_keywords,text_tfidf,docs_bm25_topk,docs_pipeline_e2e,text_bpe_train

SPARK_GRAFT_SF_DIR=data/sf1 \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_REPS=${SPARK_GRAFT_BENCH_REPS:-3} \
SPARK_GRAFT_QUERIES="$QUERIES" \
SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || true

python3 - <<'EOF'
import json, os

# Inject each sf1 stored artifact's on-disk bytes (VERDICT r8 task #5):
# compression wins — and any future artifact bloat — become gate-visible.
def du(path):
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total

art = {}
wh = "spark-warehouse"
if os.path.isdir(wh):
    for name in sorted(os.listdir(wh)):
        if (name.startswith("graft_") and "data_sf1" in name
                and "data_sf10" not in name):
            art[name] = du(os.path.join(wh, name))
# the raw sf1 embeddings, for the IVF-PQ codes-vs-corpus ratio
if os.path.isdir("data/sf1/embeddings.parquet"):
    art["_raw_embeddings"] = du("data/sf1/embeddings.parquet")

d = json.load(open("BENCH_sf1.json"))
d["artifact_bytes"] = art
json.dump(d, open("BENCH_sf1.json", "w"))
print(f"[bench_sf1] total {d['value']:.1f}s over {len(d['queries'])} queries, "
      f"failed={d['failed']}, timed_builds={d['timed_artifact_builds']}")
for q, s in sorted(d["queries"].items(), key=lambda kv: -kv[1]):
    print(f"  {q:32s} {s:7.2f}s  shuffle {d['shuffle_mb'][q]:8.1f} MB")
for a, b in art.items():
    print(f"  artifact {a:48s} {b/1e6:9.2f} MB")
EOF
