"""Cross-round bench regression report: compare the freshest per-query
timings (BENCH_FULL.json) against the newest prior BENCH_r*.json and flag
material changes, so regressions surface as a list instead of a manual
scan of 180 numbers.

A change is flagged when BOTH hold: ratio >= FLAG_RATIO and absolute
delta >= FLAG_ABS_SEC (ratio alone cries wolf on 0.2s -> 0.5s noise; the
absolute floor alone hides a 10x blowup of a formerly-fast query only
when it stays trivially cheap).

Usage: python tools/bench_diff.py [old.json] [new.json]
Defaults: newest BENCH_r*.json vs BENCH_FULL.json.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAG_RATIO = 2.0
FLAG_ABS_SEC = 1.0


def _load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d and isinstance(d["parsed"], dict):  # driver BENCH_r shape
        d = d["parsed"]
    return {k: v for k, v in d.get("queries", {}).items() if v >= 0}


def main() -> None:
    if len(sys.argv) > 2:
        old_path, new_path = sys.argv[1], sys.argv[2]
    elif len(sys.argv) == 2:
        # one explicit path = the old side; new defaults to BENCH_FULL
        old_path = sys.argv[1]
        new_path = os.path.join(REPO, "BENCH_FULL.json")
    else:
        rounds = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
        if not rounds:
            print("no BENCH_r*.json to compare against", file=sys.stderr)
            sys.exit(1)
        old_path = rounds[-1]
        new_path = os.path.join(REPO, "BENCH_FULL.json")
    old, new = _load_queries(old_path), _load_queries(new_path)
    shared = sorted(set(old) & set(new))
    regressed, improved = [], []
    for name in shared:
        o, n = old[name], new[name]
        if n >= o * FLAG_RATIO and n - o >= FLAG_ABS_SEC:
            regressed.append((n / max(o, 1e-9), o, n, name))
        elif o >= n * FLAG_RATIO and o - n >= FLAG_ABS_SEC:
            improved.append((o / max(n, 1e-9), o, n, name))
    print(f"# {os.path.basename(old_path)} -> {os.path.basename(new_path)}: "
          f"{len(shared)} shared queries, "
          f"{len(new.keys() - old.keys())} new, {len(old.keys() - new.keys())} gone")
    for tag, rows in (("REGRESSED", regressed), ("improved", improved)):
        for ratio, o, n, name in sorted(rows, reverse=True):
            print(f"{tag:9s} {name:40s} {o:7.2f}s -> {n:7.2f}s  ({ratio:.1f}x)")
    if not regressed:
        print("no regressions above the flag thresholds")


if __name__ == "__main__":
    main()
