#!/usr/bin/env python3
"""Paired DuckDB comparator run for the 2x perf gate.

Usage: python3 scripts/duckdb_bench.py <sfDir> <verifyOutDir> [outJson]

Times every oracle SQL from <verifyOutDir>/oracle_sql.json (dumped by
graft.Verify) in single-node DuckDB over the same parquet tables the
Spark bench reads, and writes one JSON file (default: repo-root
duckdb_bench.json) with per-query seconds and the suite total.
graft.Bench embeds that file's total into its own JSON line as
"duckdb_total"/"duckdb_queries", so every BENCH_rN.json carries both
sides of the ratio and the gate is auditable per round.

Run it after a full Verify at the BENCH scale factor (sf0.1):
  sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/vout"
  python3 scripts/duckdb_bench.py /root/testdata/sf0.1 /tmp/vout
"""
import sys, os, json, time
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
out_json = sys.argv[3] if len(sys.argv) > 3 else \
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "duckdb_bench.json")

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
times = {}
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.execute(oracle[name]).fetchall()
        times[name] = round(time.time() - t0, 3)
    except Exception as e:
        print(f"[duckdb_bench] {name} failed: {e}", file=sys.stderr)
        times[name] = None
    print(f"{name}: {times[name]} s")

good = [v for v in times.values() if v is not None]
result = {
    "sf": sf_dir,
    "n_queries": len(times),
    "failed": sorted(k for k, v in times.items() if v is None),
    "total": round(sum(good), 3),
    "queries": times,
}
with open(out_json, "w") as f:
    json.dump(result, f)
    f.write("\n")
print(f"\nDuckDB suite total: {result['total']} s "
      f"({len(good)}/{len(times)} queries) -> {out_json}")
