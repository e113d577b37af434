#!/usr/bin/env bash
# Standing sf10 (100x) scale gate — VERDICT r10 task #3.
#
# The 100x numbers used to live in SCALE.md prose from one-off
# rehearsals; this promotes the sf10 heavies to a committed artifact
# (BENCH_sf10.json) so 100x regressions are caught by diff, not
# re-rehearsal. Protocol mirrors tools/bench_sf1.sh: median-of-3 for the
# stored/serving shapes, single rep for the in-query LSH tier (its ~2 min
# diagnostic twin would triple the gate's wall for a number whose whole
# job is order-of-magnitude context), artifact bytes injected at the end.
#
# Fixture: documents + lineitem at 100x (ScaleUp keeps the workload's
# character — word-shuffled replicas, disconnected graph copies — and a
# full-table 100x fixture would be >12 GB of unread parquet).
#
# Usage: bash tools/bench_sf10.sh   (from /root/repo; ~25-40 min cold,
# most of it write-once artifact builds that later rounds skip)
set -euo pipefail
cd "$(dirname "$0")/.."

if [ ! -d data/sf10/documents.parquet ] || [ ! -d data/sf10/lineitem.parquet ]; then
  echo "[bench_sf10] building data/sf10 fixture (100x sf0.1: documents,lineitem)"
  sbt -batch "runMain graft.util.ScaleUp /root/testdata/sf0.1 data/sf10 100 documents,lineitem"
fi

# Median-of-3 over the serving/stored shapes + the linear e2e pipeline.
Q3=dedup_minhash_lsh_stored,dedup_incremental_lsh_stored,docs_cross_source_dup,docs_pipeline_e2e,graph_pagerank_stored,graph_kcore_stored
SPARK_GRAFT_SF_DIR=data/sf10 \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_QUERIES="$Q3" \
SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10_a.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || true

# The in-query LSH tier: 1 rep, documented diagnostic (the production
# shape is the stored twin; this number tracks the re-derivation slope).
SPARK_GRAFT_SF_DIR=data/sf10 \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_REPS=1 \
SPARK_GRAFT_QUERIES=dedup_minhash_lsh \
SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10_b.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || true

python3 - <<'EOF'
import json, os

a = json.load(open("/tmp/bench_sf10_a.json"))
b = json.load(open("/tmp/bench_sf10_b.json"))

out = {
    "metric": "sf10_total", "unit": "sec", "sf": "data/sf10",
    "value": round(a["value"] + b["value"], 3),
    "failed": a["failed"] + b["failed"],
    "timed_artifact_builds": a["timed_artifact_builds"] + b["timed_artifact_builds"],
    "reps": {"stored": a["reps"], "inquery": b["reps"]},
    "host": {"stored": a.get("host"), "inquery": b.get("host")},
    "queries": {**a["queries"], **b["queries"]},
    "samples": {**a.get("samples", {}), **b.get("samples", {})},
    "shuffle_mb": {**a.get("shuffle_mb", {}), **b.get("shuffle_mb", {})},
    "spill_mb": {**a.get("spill_mb", {}), **b.get("spill_mb", {})},
}

def du(path):
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total

art = {}
wh = "spark-warehouse"
if os.path.isdir(wh):
    for name in sorted(os.listdir(wh)):
        if name.startswith("graft_") and "data_sf10" in name:
            art[name] = du(os.path.join(wh, name))
out["artifact_bytes"] = art

json.dump(out, open("BENCH_sf10.json", "w"))
print(f"[bench_sf10] total {out['value']:.1f}s over {len(out['queries'])} "
      f"queries, failed={out['failed']}, timed_builds={out['timed_artifact_builds']}")
for q, s in sorted(out["queries"].items(), key=lambda kv: -kv[1]):
    sh = out["shuffle_mb"].get(q, 0.0)
    sp = out["spill_mb"].get(q, 0.0)
    print(f"  {q:32s} {s:8.2f}s  shuffle {sh:9.1f} MB  spill {sp:8.1f} MB")
for n, v in art.items():
    print(f"  artifact {n:52s} {v/1e6:10.2f} MB")
EOF
