#!/usr/bin/env python3
"""Empirical scale-slope audit for the flagship query families.

Times the dedup family (q22/q24/q49/q51/q98), the ANN family
(q18/q97/q153), and the banded window ranks (q197) at sf0.001 / sf0.01 /
sf0.1 via graft.Bench, then checks the INCREMENTAL slope between
adjacent scale factors: with rows proportional to SF, a linear operator
has  slope2 = (t(0.1)-t(0.01)) / (rows(0.1)-rows(0.01))  roughly equal
to  slope1 = (t(0.01)-t(0.001)) / (rows(0.01)-rows(0.001)) ; a
quadratic one shows slope2/slope1 ~ 10. Incremental slopes amortize the
fixed JVM/scheduling overhead that plain t-ratios would misread at
these small absolute times.

Flags any query with slope2/slope1 > THRESH (default 3.0 -- generous
against timer noise, far below the ~10x a quadratic stage shows).

Usage: python3 scripts/scale_curve.py [outJson]
Writes the per-query table to outJson (default scale_curve.json) and
prints a markdown table for SCALE.md.
"""
import json
import os
import subprocess
import sys

QUERIES = ("q22,q24,q49,q51,q98,q18,q97,q153,q197,"
           "q214,q215,q216,q217,q218,q219,q220,q221,q222,q223,q224,"
           "q225,q226,q227,q228,q229,q230,q231,q232,q233,q234,q235,"
           "q236,q237,q238,q239,q240,q241,q242,q243,q244,q245,q246,"
           "q247,q248,q249,q250,q251,q252,q253,q254,q255,q256,q257,"
           "q258,q259,q260,q261,q262,q263,q264,q265,q266,q267,"
           "q268,q269,q270,q271,q272,q273,q274")
SFS = [("0.001", 0.001), ("0.01", 0.01), ("0.1", 0.1)]
THRESH = 3.0

out_json = sys.argv[1] if len(sys.argv) > 1 else "scale_curve.json"

results = {}
for name, _ in SFS:
    out = f"/tmp/scale_bench_{name}.json"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{name}",
               SPARK_GRAFT_BENCH_ONLY=QUERIES,
               SPARK_GRAFT_BENCH_REPS="3",
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(f"[scale] benching sf{name} ...", flush=True)
    subprocess.run(["sbt", "-batch", f"runMain graft.Bench {out}"],
                   env=env, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    results[name] = json.load(open(out))["queries"]

names = sorted(results["0.1"].keys())
rows = []
flagged = []
for q in names:
    t1, t2, t3 = (results[s].get(q) for s, _ in SFS)
    # a query whose every rep failed at some SF is recorded as null by
    # Bench (which still exits 0): FLAG it instead of dying on None math
    if None in (t1, t2, t3):
        rows.append((q, t1 or -1.0, t2 or -1.0, t3 or -1.0,
                     "BENCH FAILURE at some SF (null timing)", True))
        flagged.append(q)
        continue
    # incremental slopes in sec per unit-SF (rows ~ SF)
    s1 = (t2 - t1) / (0.01 - 0.001)
    s2 = (t3 - t2) / (0.1 - 0.01)
    # guard: if the 0.001->0.01 increment is within timer noise (<50 ms),
    # fall back to comparing t3/t2 against the 10x row ratio instead
    if s1 <= 0 or (t2 - t1) < 0.05:
        ratio = t3 / t2 if t2 > 0 else float("inf")
        superlinear = ratio > 10 * THRESH
        verdict = f"t-ratio {ratio:.1f}x vs 10x rows"
    else:
        ratio = s2 / s1
        superlinear = ratio > THRESH
        verdict = f"slope ratio {ratio:.2f}"
    rows.append((q, t1, t2, t3, verdict, superlinear))
    if superlinear:
        flagged.append(q)

report = {
    "queries": {q: {"sf0.001": t1, "sf0.01": t2, "sf0.1": t3,
                    "verdict": v, "superlinear": f}
                for q, t1, t2, t3, v, f in rows},
    "threshold": THRESH,
    "flagged": flagged,
}
json.dump(report, open(out_json, "w"), indent=1)

print("\n| query | sf0.001 s | sf0.01 s | sf0.1 s | slope check |")
print("|---|---|---|---|---|")
for q, t1, t2, t3, v, f in rows:
    mark = " **SUPERLINEAR**" if f else ""
    print(f"| {q} | {t1:.2f} | {t2:.2f} | {t3:.2f} | {v}{mark} |")
print(f"\nflagged: {flagged or 'none'}")
sys.exit(1 if flagged else 0)
