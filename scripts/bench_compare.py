"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage:
    python scripts/bench_compare.py BENCH_old.json BENCH_new.json [ratio]

Accepts either the raw one-line JSON bench.py prints or the driver's
wrapper ({"parsed": {...}}). Exit code 1 if any shared query slowed
more than `ratio` (default 1.5) AND by more than 0.3 s absolute (the
floor keeps scheduler jitter on sub-second queries from flagging).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' key")
    return d


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))
    regressions = []
    for q in shared:
        a, b = old["queries"][q], new["queries"][q]
        if b > a * ratio and b - a > 0.3:
            regressions.append((q, a, b))
        print(f"  {q:28s} {a:8.3f}s -> {b:8.3f}s  ({b / a:5.2f}x)")
    print(f"total: {old.get('value')}s -> {new.get('value')}s "
          f"({len(shared)} shared, +{len(added)} added, -{len(removed)} removed)")
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    if regressions:
        print("REGRESSIONS (>%.1fx and >0.3s):" % ratio)
        for q, a, b in regressions:
            print(f"  {q}: {a:.3f}s -> {b:.3f}s")
        return 1
    print("OK: no per-query regression")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
