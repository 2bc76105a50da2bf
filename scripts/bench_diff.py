#!/usr/bin/env python3
"""Per-query regression diff between two graft.Bench result files.

Usage: python3 scripts/bench_diff.py <old.json> <new.json> [ratio] [floor_s]

Flags queries whose time grew by more than `ratio` (default 2.0) AND by
more than `floor_s` absolute seconds (default 0.5) — the same
2x-or-0.5s threshold the round judges apply. Accepts either a plain
graft.Bench detail file ({"queries": {...}}) or a driver BENCH_rN.json
wrapper (reads "parsed", falling back to recovering the queries map
from the raw "tail" text). Exits nonzero on any flagged regression.
"""
import json
import re
import sys


def load_queries(path):
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"]
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    # driver wrapper whose stdout JSON was truncated: scrape the tail
    # (null = graft.Bench's explicit all-reps-failed marker — keep it)
    tail = d.get("tail", "")
    return {m.group(1): (None if m.group(2) == "null" else float(m.group(2)))
            for m in
            re.finditer(r'"(q\d+[a-z0-9_]*)":(null|[0-9.]+)', tail)}


old_p, new_p = sys.argv[1], sys.argv[2]
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5

old, new = load_queries(old_p), load_queries(new_p)
common = sorted(set(old) & set(new))
print(f"{len(common)} queries in both ({len(old)} old, {len(new)} new)")

regressions, improved = [], []
for q in common:
    o, n = old[q], new[q]
    # null = graft.Bench's all-reps-failed marker: working -> broken is
    # the worst regression there is, never a silent skip
    if n is None and o is not None:
        regressions.append((float("inf"), q, o, float("nan")))
        continue
    if o is None:
        continue  # was already broken; nothing to regress from
    if n > o * ratio and n - o > floor:
        regressions.append((n - o, q, o, n))
    elif o > n * ratio and o - n > floor:
        improved.append((o - n, q, o, n))

for d, q, o, n in sorted(improved, reverse=True)[:10]:
    print(f"  improved  {q}: {o:.2f}s -> {n:.2f}s")
if regressions:
    print(f"\n{len(regressions)} REGRESSIONS (> {ratio}x and > {floor}s):")
    for d, q, o, n in sorted(regressions, reverse=True):
        print(f"  REGRESSED {q}: {o:.2f}s -> {n:.2f}s (+{d:.2f}s)")
    sys.exit(1)
timed = [q for q in common if old[q] is not None and new[q] is not None]
print(f"\n0 regressions at the {ratio}x-or-{floor}s threshold; "
      f"totals {sum(old[q] for q in timed):.1f}s -> "
      f"{sum(new[q] for q in timed):.1f}s on the common timed set")
