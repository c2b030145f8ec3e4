#!/usr/bin/env python3
"""Local correctness loop mimicking the driver's t2 gate:
run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then this script compares each query's parquet against its DuckDB oracle.

Usage: python3 tools/check.py [sfDir] [outDir]
"""
import duckdb, json, sys, glob, os, math

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
    try:
        a = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}");  n_fail += 1;  continue
    b = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns oracle={list(a.columns)} spark={list(b.columns)}")
        n_fail += 1;  continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows oracle={len(a)} spark={len(b)}");  n_fail += 1;  continue
    a = a.sort_values(by=list(a.columns), ignore_index=True)
    b = b.sort_values(by=list(b.columns), ignore_index=True)
    bad = None
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype) != str(bv.dtype):
            bad = f"dtype {c}: oracle={av.dtype} spark={bv.dtype}";  break
        if av.dtype.kind == "f":
            import numpy as np
            if not np.allclose(av.fillna(-1e308), bv.fillna(-1e308), rtol=0, atol=0):
                exact = (av.fillna(-1e308) == bv.fillna(-1e308))
                i = (~exact).idxmax()
                bad = f"value {c}@{i}: oracle={av[i]!r} spark={bv[i]!r}";  break
        else:
            eq = (av.fillna("__NULL__") == bv.fillna("__NULL__")) if av.dtype == object \
                else (av.fillna(-999999) == bv.fillna(-999999))
            if not eq.all():
                i = (~eq).idxmax()
                bad = f"value {c}@{i}: oracle={av[i]!r} spark={bv[i]!r}";  break
    if bad:
        print(f"FAIL {name}: {bad}");  n_fail += 1
    else:
        print(f"ok   {name} ({len(a)} rows)");  n_pass += 1

missing = set()  # queries without oracle get rows-only smoke: report presence
for d in glob.glob(f"{out}/*/"):
    qn = os.path.basename(d.rstrip("/"))
    if qn not in oracle:
        missing.add(qn)
for qn in sorted(missing):
    files = glob.glob(f"{out}/{qn}/*.parquet")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{qn}/*.parquet')").fetchone()[0] if files else 0
    print(f"info {qn}: no oracle, rows={n}")

print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} oracled")
sys.exit(1 if n_fail else 0)
