#!/usr/bin/env python3
"""Per-query bench diff between two bench artifacts (VERDICT r9 task #3).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [ratio]

Both files are Bench.scala outputs (full form with a "queries" map of
per-query median seconds; the compact BENCH_r{N}.json top-12 form works
too, over its smaller overlap). Prints every query whose median moved by
more than `ratio` (default 1.5x) in either direction, plus appeared /
disappeared queries, so "which queries regressed?" is answerable between
any two committed rounds.

Exit code 0 always — this is a report, not a gate; the 2x gate lives in
the judge's protocol.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # Driver BENCH_r{N}.json wraps the compact bench line under "parsed".
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    qs = d.get("queries", {})
    # -1 medians mark failed queries; keep them visible but never divide.
    return {k: v for k, v in qs.items()}, d


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, dold = load(old_path)
    new, dnew = load(new_path)
    shared = sorted(set(old) & set(new))
    movers = []
    for q in shared:
        a, b = old[q], new[q]
        if a < 0 or b < 0:
            movers.append((float("inf"), q, a, b, "FAILED" if b < 0 else "recovered"))
            continue
        if a <= 0:
            continue
        r = b / a
        if r >= ratio or r <= 1.0 / ratio:
            movers.append((max(r, 1.0 / r), q, a, b,
                           "slower" if r > 1 else "faster"))
    movers.sort(key=lambda t: -t[0])
    print(f"# bench diff  {old_path} ({dold.get('sf','?')}, "
          f"{len(old)} queries) -> {new_path} ({dnew.get('sf','?')}, "
          f"{len(new)} queries), threshold {ratio}x")
    print(f"  totals: {dold.get('value', 0):.1f}s -> {dnew.get('value', 0):.1f}s; "
          f"shared {len(shared)} queries")
    if not movers:
        print(f"  no query moved >= {ratio}x")
    for r, q, a, b, tag in movers:
        rs = "inf" if r == float("inf") else f"{r:.2f}x"
        print(f"  {q:40s} {a:8.2f}s -> {b:8.2f}s  {rs:>7s} {tag}")
    gone = sorted(set(old) - set(new))
    came = sorted(set(new) - set(old))
    if gone:
        print(f"  disappeared ({len(gone)}): {', '.join(gone[:20])}")
    if came:
        print(f"  appeared ({len(came)}): {', '.join(came[:20])}")


if __name__ == "__main__":
    main()
