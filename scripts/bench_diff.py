#!/usr/bin/env python3
"""Per-query regression diff between two graft.Bench result files.

Usage: python3 scripts/bench_diff.py <old.json> <new.json> [ratio] [floor_s]

Flags queries whose time grew by more than `ratio` (default 2.0) AND by
more than `floor_s` absolute seconds (default 0.5) — the same
2x-or-0.5s threshold the round judges apply. Accepts either a plain
graft.Bench detail file ({"queries": {...}}) or a driver BENCH_rN.json
wrapper (reads "parsed", falling back to recovering the queries map
from the raw "tail" text). Exits nonzero on any flagged regression.

DRIFT NORMALIZATION: when BOTH files carry graft.Bench's calibration
sentinel (one pinned query timed at bench start and end), the new
run's times are divided by the sentinel ratio (new mid-bench sentinel
mean / old) before comparison, so whole-environment drift — a noisier
shared box — doesn't read as dozens of phantom per-query regressions
(round 11: +9% median drift, 33 of 35 apparent regressions phantom).
The normalization is capped to ±30%: a sentinel moving more than that
is itself suspect and is reported instead of silently trusted.
"""
import json
import re
import sys


def load_bench(path):
    d = json.load(open(path))
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        d = d["parsed"]
    if "queries" in d:
        return d["queries"], d.get("sentinel")
    # driver wrapper whose stdout JSON was truncated: scrape the tail
    # (null = graft.Bench's explicit all-reps-failed marker — keep it)
    tail = d.get("tail", "")
    qs = {m.group(1): (None if m.group(2) == "null" else float(m.group(2)))
          for m in
          re.finditer(r'"(q\d+[a-z0-9_]*)":(null|[0-9.]+)', tail)}
    sm = re.search(r'"sentinel":\{"name":"([^"]+)","start":([0-9.]+),'
                   r'(?:"mid":([0-9.]+),)?'
                   r'"end":([0-9.]+)'
                   r'(?:,"drift":([0-9.]+))?(?:,"drifted":(true|false))?\}',
                   tail)
    sent = None
    if sm:
        sent = {"name": sm.group(1), "start": float(sm.group(2)),
                "end": float(sm.group(4))}
        if sm.group(3):
            sent["mid"] = float(sm.group(3))
        if sm.group(5):
            sent["drift"] = float(sm.group(5))
        if sm.group(6):
            sent["drifted"] = sm.group(6) == "true"
    return qs, sent


old_p, new_p = sys.argv[1], sys.argv[2]
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5

(old, old_sent), (new, new_sent) = load_bench(old_p), load_bench(new_p)
common = sorted(set(old) & set(new))
print(f"{len(common)} queries in both ({len(old)} old, {len(new)} new)")

# QUARANTINE: either side SELF-LABELING as drifted (graft.Bench's
# mid-run sentinel spread exceeded its limit) poisons the comparison —
# a drifted NEW run produces phantom regressions (round 12: 4 phantom,
# one 17x), and a drifted OLD baseline hides REAL regressions behind
# its inflated times (they read as 'improved'). Refuse per-query flags;
# exit 2 so automation can tell "quarantined" from "regressed" (1) and
# "clean" (0).
for side, path, sent in (("new", new_p, new_sent), ("old", old_p, old_sent)):
    if sent and sent.get("drifted"):
        print(f"QUARANTINED: {side} run {path} self-labels as DRIFTED "
              f"(sentinel spread {sent.get('drift', float('nan')):.2f}x "
              f"across the run) — re-record on a calm box instead of "
              f"comparing. No per-query flags produced.")
        sys.exit(2)

drift = 1.0
if new_sent:
    # mid-bench SLOWDOWN only needs the NEW run's sentinel — warn even
    # when the old run predates the sentinel feature. A start-faster-
    # than-end pattern is the anomaly: progressive JVM warmup always
    # makes the END sentinel FASTER (observed ~2x on an idle box), so
    # only end-slower-than-start means the box degraded mid-bench.
    if new_sent["end"] > new_sent["start"] * 1.3:
        print(f"WARNING: new run's sentinel SLOWED "
              f"{new_sent['end'] / max(new_sent['start'], 1e-9):.2f}x "
              f"START->END ({new_sent['start']:.3f}s -> "
              f"{new_sent['end']:.3f}s) — the box degraded MID-BENCH; "
              f"per-query flags are low-confidence")
if (old_sent and new_sent and old_sent.get("name") == new_sent.get("name")
        and min(old_sent["start"], old_sent["end"]) > 0):
    # normalize by the END sentinels: both runs' end-of-bench JVMs are
    # fully warm (the start ones are only partially warmed and noisier)
    o_s, n_s = old_sent["end"], new_sent["end"]
    raw = n_s / o_s
    if 0.7 <= raw <= 1.3:
        drift = raw
        print(f"sentinel {old_sent['name']} (end): {o_s:.3f}s -> "
              f"{n_s:.3f}s; normalizing new times by /{drift:.3f}")
    else:
        print(f"WARNING: sentinel moved {raw:.2f}x "
              f"({o_s:.3f}s -> {n_s:.3f}s) — beyond the 0.7-1.3 trust "
              f"band; comparing UNNORMALIZED")
new = {q: (None if t is None else t / drift) for q, t in new.items()}

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
