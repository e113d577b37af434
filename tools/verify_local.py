#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs graft.Verify via sbt at the given SF, then executes each entry of
oracle_sql.json in DuckDB over the same parquet tables and compares
row count, column names, and a row-order-insensitive hash of the
stringified values with columns sorted by name (like the driver).

Usage: python3 tools/verify_local.py [sfDir] [--skip-spark] [query ...]
"""
import hashlib
import json
import math
import subprocess
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
# Per-SF output dir so concurrent runs at different SFs never race on
# each other's dumps.
OUT = "/tmp/graft_verify_" + SF.rstrip("/").rsplit("/", 1)[-1]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    args = [a for a in sys.argv[2:]]
    skip_spark = "--skip-spark" in args
    only = [a for a in args if not a.startswith("--")]
    if not skip_spark:
        names = " " + " ".join(only) if only else ""
        cmd = f'sbt -batch "runMain graft.Verify {SF} {OUT}{names}"'
        r = subprocess.run(cmd, shell=True, capture_output=True, text=True, timeout=1800)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
        if r.returncode != 0:
            print(tail)
            sys.exit(1)
        if "[verify]" in r.stdout + r.stderr:
            print("\n".join(l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l))

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
            s_cols = [c.lower() for c in spark_rel.columns]
            s_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            d_cols = [c.lower() for c in duck_rel.columns]
            d_types = [str(t).upper() for t in duck_rel.types]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        # Type audit: DuckDB sum(BIGINT) silently widens to HUGEINT
        # (INT128), which Python int coercion hides HERE but the driver's
        # canonicalizer renders differently from Spark's BIGINT — the
        # exact docs_split round-4 failure mode. Any HUGEINT output
        # column means a missing CAST(... AS BIGINT) in the oracle SQL.
        hupe = [c for c, t in zip(d_cols, d_types) if "HUGEINT" in t]
        if hupe:
            problems.append(f"oracle emits HUGEINT column(s) {hupe} — "
                            "add CAST(... AS BIGINT) (see SparkEntry.oracleSql rule)")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        elif len(s_rows) != len(d_rows):
            problems.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        elif table_hash(s_rows, s_cols) != table_hash(d_rows, d_cols):
            problems.append("hash mismatch")
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            ls = sorted("|".join(canon(r[i]) for i in order_s) for r in s_rows)
            ld = sorted("|".join(canon(r[i]) for i in order_d) for r in d_rows)
            for a, b in zip(ls, ld):
                if a != b:
                    problems.append(f"  spark: {a[:300]}\n  duck : {b[:300]}")
                    break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    # queries with no oracle: rows-only presence check
    for name in sorted(set(x.strip("/").split("/")[-1] for x in
                           __import__("glob").glob(f"{OUT}/*/")) - set(oracle)):
        try:
            n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}/*.parquet'").fetchone()[0]
            print(f"INFO {name}: no oracle, {n} rows")
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
