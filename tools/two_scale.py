#!/usr/bin/env python3
"""Two-scale sweep comparison: bench_results.json (sf0.1) vs an SF-1-sized
sweep record. Flags queries whose time ratio exceeds the data ratio by the
given factor (default 5x => ratio > 50 at 10x data) -- the fixture-hidden
scaling cliffs the sweep exists to catch.

usage: two_scale.py <sf0.1_record.json> <sfx_record.json> [cliff_factor]
"""
import json, sys

a = json.load(open(sys.argv[1]))  # sf0.1
b = json.load(open(sys.argv[2]))  # sfx (10x data)
cliff = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
data_ratio = 10.0

qa, qb = a["queries"], b["queries"]
rows = []
for name in sorted(qb):
    if name not in qa:
        continue
    ta, tb = qa[name], qb[name]
    if ta is None or tb is None or ta < 0 or tb < 0:
        # normalize missing timings to a sentinel so the formatted print
        # below never sees None; FAILED means the sfx run itself errored
        # (negative timing) -- a legitimate 0.0 timing is not a failure
        failed = tb is not None and tb < 0
        rows.append((float("inf"), name,
                     -1.0 if ta is None else ta,
                     -1.0 if tb is None else tb,
                     "FAILED" if failed else ""))
        continue
    # sub-second sf0.1 queries are dominated by fixed plan/jit overhead;
    # ratio against max(ta, 1s) avoids flagging 0.2s -> 2.5s as a cliff
    ratio = tb / max(ta, 1.0)
    flag = "CLIFF" if ratio > cliff * data_ratio else ("super" if ratio > data_ratio else "")
    rows.append((ratio, name, ta, tb, flag))

rows.sort(reverse=True)
print(f"{'ratio':>8}  {'sf0.1 s':>8}  {'sfx s':>8}  query")
for ratio, name, ta, tb, flag in rows:
    r = f"{ratio:8.1f}" if ratio != float("inf") else "     err"
    print(f"{r}  {ta:8.2f}  {tb:8.2f}  {name} {flag}")
tot_a = sum(v for k, v in qa.items() if v and v > 0)
tot_b = sum(v for k, v in qb.items() if k in qa and v and v > 0)
print(f"\ntotals: sf0.1 {tot_a:.1f}s, sfx {tot_b:.1f}s, overall ratio {tot_b/tot_a:.1f}x at {data_ratio:.0f}x data")
