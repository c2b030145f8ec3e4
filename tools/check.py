#!/usr/bin/env python3
"""Local correctness loop mimicking the driver's t2 gate:
run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then this script compares each query's parquet against its DuckDB oracle.

Two layers per query, both must pass:
  1. pandas value compare (row count, dtypes, exact values) — catches
     semantic mismatches with a readable first-bad-cell message;
  2. STRICT HASH: the oracle result is COPY'd to parquet and both files
     are reduced to (parquet physical schema) + (repr of every value,
     type-preserving) and md5'd. This is the layer that catches what
     pandas silently forgives — decimal scale/physical-type drift,
     float-vs-decimal column types, trailing-zero representation — the
     exact class that made q_s_ivf_ann (r6) and q_e_hopping_window (r7)
     pass locally yet fail the driver's hash.

Usage: python3 tools/check.py [sfDir] [outDir]
"""
import duckdb, json, sys, glob, os, math, hashlib, tempfile

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

# a SPARK_GRAFT_ONLY-filtered Verify writes oracle_sql.partial.json so it
# can never clobber the canonical artifact; prefer it when present (it
# matches the subset of dumped queries)
_partial = f"{out}/oracle_sql.partial.json"
oracle_path = _partial if os.path.exists(_partial) else f"{out}/oracle_sql.json"
oracle = json.load(open(oracle_path))


def physical_schema(parquet_file):
    """(name, physical_type, logical_type) per column — the layer the
    driver's hash sees and pandas does not."""
    import pyarrow.parquet as pq
    s = pq.ParquetFile(parquet_file).schema
    cols = []
    for i in range(len(s)):
        c = s.column(i)
        logical = str(c.logical_type)
        # DuckDB annotates INT32/INT64 with a redundant signed-Int
        # logical type; Spark leaves it bare. Same type — normalize.
        if logical in ("Int(bitWidth=32, isSigned=true)",
                       "Int(bitWidth=64, isSigned=true)"):
            logical = "None"
        cols.append((c.name, str(c.physical_type), logical))
    return sorted(cols)


def serialize_cell(v):
    """Type-preserving canonical repr: Decimal('1.50') != Decimal('1.5')
    != 1.5 here, though all compare equal numerically."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        return f"float:{v!r}"
    return f"{type(v).__name__}:{v!r}"


def strict_hash(parquet_glob):
    """md5 over physical schema + column-name-sorted, row-sorted values."""
    files = sorted(glob.glob(parquet_glob))
    schema = physical_schema(files[0])
    cols = [c[0] for c in schema]
    sel = ", ".join(f'"{c}"' for c in cols)
    rows = con.execute(
        f"SELECT {sel} FROM read_parquet('{parquet_glob}')").fetchall()
    rows = sorted("|".join(serialize_cell(v) for v in r) for r in rows)
    h = hashlib.md5()
    h.update(repr(schema).encode())
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest(), schema


n_pass = n_fail = 0
tmpdir = tempfile.mkdtemp(prefix="graft_oracle_pq_")
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
        print(f"FAIL {name}: {bad}");  n_fail += 1;  continue

    # layer 2: strict hash — oracle result through a REAL parquet writer,
    # then both sides hashed at physical-schema + repr level
    try:
        opath = os.path.join(tmpdir, f"{name}.parquet")
        con.execute(
            f"COPY ({oracle[name]}) TO '{opath}' (FORMAT PARQUET)")
        ha, sa = strict_hash(opath)
        hb, sb = strict_hash(f"{out}/{name}/*.parquet")
    except Exception as e:
        print(f"FAIL {name}: strict-hash error: {e}");  n_fail += 1;  continue
    if ha != hb:
        if sa != sb:
            diff = [(x, y) for x, y in zip(sa, sb) if x != y]
            print(f"FAIL {name}: physical schema drift {diff}")
        else:
            print(f"FAIL {name}: strict hash mismatch (same schema — "
                  f"value representation differs; check decimals/floats)")
        n_fail += 1
    else:
        print(f"ok   {name} ({len(a)} rows, hash {ha[:8]})");  n_pass += 1

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
