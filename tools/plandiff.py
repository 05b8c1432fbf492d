#!/usr/bin/env python3
"""Round-over-round plan-regression diff: compare two Bench artifacts'
per-query Exchange counts and medians. A timing shift WITHOUT an
exchange-count shift is environmental noise; WITH one it's a plan
regression (VERDICT r8 item 8). Dev tool only.

Usage: tools/plandiff.py [OLD.json] [NEW.json]   (defaults: last
BENCH_r*.json vs bench_out.json)
"""
import json, sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load(p):
    d = json.loads(Path(p).read_text())
    if "parsed" in d:  # driver wrapper (BENCH_rN.json): bench line inside
        d = d["parsed"] or {}
    out = {}
    for name, v in d.get("queries", {}).items():
        if isinstance(v, dict):
            out[name] = (v.get("median"), v.get("n_exchanges"))
        else:  # pre-r9 artifact: bare seconds, no plan fingerprint
            out[name] = (v, None)
    return out


if len(sys.argv) > 2:
    old_p, new_p = sys.argv[1], sys.argv[2]
else:
    rounds = sorted(REPO.glob("BENCH_r*.json"))
    if not rounds:
        sys.exit("no BENCH_r*.json found")
    old_p = sys.argv[1] if len(sys.argv) > 1 else rounds[-1]
    new_p = REPO / "bench_out.json"

old, new = load(old_p), load(new_p)
print(f"old={old_p}  new={new_p}")

plan_changed, timing_only, added, removed = [], [], [], []
for name in sorted(set(old) | set(new)):
    if name not in old:
        added.append(name)
        continue
    if name not in new:
        removed.append(name)
        continue
    (ot, ox), (nt, nx) = old[name], new[name]
    if ox is not None and nx is not None and ox != nx:
        plan_changed.append((name, ox, nx, ot, nt))
    elif ot and nt and nt > 2 * ot and nt - ot > 0.3:
        timing_only.append((name, ot, nt))

if plan_changed:
    print("\nPLAN CHANGED (exchange count shifted — real plan regression/fix):")
    for name, ox, nx, ot, nt in plan_changed:
        print(f"  {name}: exchanges {ox} -> {nx}, median {ot}s -> {nt}s")
if timing_only:
    print("\nTIMING ONLY (>2x slower, same plan — environmental or data-size):")
    for name, ot, nt in timing_only:
        print(f"  {name}: {ot}s -> {nt}s")
if added:
    print(f"\nnew queries: {', '.join(added)}")
if removed:
    print(f"\nremoved queries: {', '.join(removed)}")
if not (plan_changed or timing_only):
    print("\nno plan changes, no >2x timing shifts")
