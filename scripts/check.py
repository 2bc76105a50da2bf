#!/usr/bin/env python3
"""Local simulation of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same parquet
tables, and compares: row count, column names/types, and an order-insensitive
hash of all values. Exits nonzero if any query mismatches.
"""
import sys, os, json, hashlib
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# queries whose output ORDER is part of the contract (SparkEntry.ordered,
# dumped by Verify): compared row-order-sensitively below
ordered_path = f"{out_dir}/ordered.json"
ordered = set(json.load(open(ordered_path))) if os.path.exists(ordered_path) \
    else set()

def canon(df, keep_order=False):
    """Column-name-sorted, string-canonicalized frame; rows sorted unless
    the query's contract pins their order (keep_order)."""
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or v != v:  # None / NaN
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        rows.append("\x01".join(vals))
    if not keep_order:
        rows.sort()
    h = hashlib.sha256("\x02".join(rows).encode()).hexdigest()[:16]
    return rows, h

fails = 0
for name in sorted(oracle):
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        print(f"FAIL {name}: no result parquet")
        fails += 1
        continue
    got = con.execute(f"SELECT * FROM '{res_path}/*.parquet'").df()
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    g_schema = sorted(zip(got.columns, [str(t) for t in got.dtypes]))
    e_schema = sorted(zip(exp.columns, [str(t) for t in exp.dtypes]))
    grows, gh = canon(got, keep_order=name in ordered)
    erows, eh = canon(exp, keep_order=name in ordered)
    ok_rows = len(grows) == len(erows)
    ok_schema = [c for c, _ in g_schema] == [c for c, _ in e_schema]
    ok_hash = gh == eh
    status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
    if status == "FAIL":
        fails += 1
    mode = " ordered" if name in ordered else ""
    print(f"{status} {name}: rows {len(grows)}/{len(erows)} "
          f"schema={'=' if ok_schema else 'DIFF'} "
          f"hash={'=' if ok_hash else 'DIFF'}{mode}")
    if not ok_schema:
        print(f"   got: {g_schema}\n   exp: {e_schema}")
    if ok_schema and not ok_hash:
        diff = [(a, b) for a, b in zip(grows, erows) if a != b][:3]
        for a, b in diff:
            print(f"   got: {a[:200]}\n   exp: {b[:200]}")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
