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
if [ ! -d data/sf10/embeddings.parquet ]; then
  echo "[bench_sf10] building data/sf10 embeddings fixture (100x sf0.1)"
  sbt -batch "runMain graft.util.ScaleUp /root/testdata/sf0.1 data/sf10 100 embeddings"
fi

# Median-of-3 over the serving/stored shapes + the linear e2e pipeline.
# Round 12 (VERDICT r11 #6/#7): + the directed pagerank stored tier, the
# build-then-append probe tier, and the two stored ANN serving tiers
# (over the new 100x embeddings fixture).
Q3=dedup_minhash_lsh_stored,dedup_incremental_lsh_stored,dedup_incremental_lsh_appended_stored,docs_cross_source_dup,docs_pipeline_e2e,graph_pagerank_stored,graph_pagerank_directed_stored,graph_kcore_stored,sim_ann_ivfpq_stored,sim_ann_rhp_stored
SPARK_GRAFT_SF_DIR=data/sf10 \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_QUERIES="$Q3" \
SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10_a.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || true

# The in-query tiers: 1 rep, documented diagnostics (the production
# shapes are the stored twins; these numbers track the re-derivation
# slope). Round 12 adds dedup_clusters_lsh — the closed LSH→connected-
# components pipeline (VERDICT r11 #6).
SPARK_GRAFT_SF_DIR=data/sf10 \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_REPS=1 \
SPARK_GRAFT_QUERIES=dedup_minhash_lsh,dedup_clusters_lsh \
SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10_b.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || true

# Probe-shape A/B at a production batch ratio (VERDICT r11 #4): the
# split-sid vs all-string byte/wall trade, measured at ~0.1% of corpus
# instead of the fixture's 10% — the one SCALE.md claim that was argued,
# not measured. Probes the standard stored index built by pass 1.
# Round 13 (VERDICT r12 #1): 5 reps, and the row carries its own host
# telemetry so steal adjudication is a field read.
SPARK_GRAFT_SF_DIR=data/sf10 \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_REPS=5 \
SPARK_GRAFT_BATCH_MOD=1000 \
  sbt -batch "runMain graft.ProbeBench" 2>&1 | grep '"batch_mod"' \
  > /tmp/bench_sf10_probe.json || true

# ANN retrieval quality at 100x (VERDICT r12 #6): recall@10 of the
# stored IVF-PQ serving tier vs exact brute-force ground truth over a
# ~200-query modulus spread of the sf10 embeddings fixture.
SPARK_GRAFT_SF_DIR=data/sf10 \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.RecallBench" 2>&1 | grep '"ann_recall"' \
  > /tmp/bench_sf10_recall.json || true

python3 - <<'EOF'
import json, os

a = json.load(open("/tmp/bench_sf10_a.json"))
b = json.load(open("/tmp/bench_sf10_b.json"))
# ProbeBench prints to stdout (sbt [info]-prefixed) — strip and parse.
probe = None
try:
    with open("/tmp/bench_sf10_probe.json") as f:
        line = f.read().strip()
    probe = json.loads(line[line.index("{"):])
except Exception as e:
    print(f"[bench_sf10] WARNING: no probe A/B row ({e})")
recall = None
try:
    with open("/tmp/bench_sf10_recall.json") as f:
        line = f.read().strip()
    recall = json.loads(line[line.index("{"):])
except Exception as e:
    print(f"[bench_sf10] WARNING: no ANN recall row ({e})")

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
if probe is not None:
    out["probe_ab_smallbatch"] = probe
if recall is not None:
    out["ann_recall"] = recall

json.dump(out, open("BENCH_sf10.json", "w"))
print(f"[bench_sf10] total {out['value']:.1f}s over {len(out['queries'])} "
      f"queries, failed={out['failed']}, timed_builds={out['timed_artifact_builds']}")
for q, s in sorted(out["queries"].items(), key=lambda kv: -kv[1]):
    sh = out["shuffle_mb"].get(q, 0.0)
    sp = out["spill_mb"].get(q, 0.0)
    print(f"  {q:32s} {s:8.2f}s  shuffle {sh:9.1f} MB  spill {sp:8.1f} MB")
for n, v in art.items():
    print(f"  artifact {n:52s} {v/1e6:10.2f} MB")
if probe is not None:
    s, t = probe["split_sid"], probe["all_string"]
    print(f"  probe A/B (batch={probe['n_batch']} of {probe['n_corpus']}): "
          f"split_sid {s['sec']:.2f}s/{s['shuffle_mb']:.1f}MB  "
          f"all_string {t['sec']:.2f}s/{t['shuffle_mb']:.1f}MB")
if recall is not None:
    for tier, r in recall["tiers"].items():
        print(f"  ann recall@{recall['k']} {tier} ({recall['n_queries']} queries): "
              f"mean {r['recall_mean']:.4f} p50 {r['recall_p50']:.4f} "
              f"min {r['recall_min']:.4f}")
EOF
