"""Diff two bench detail files (BENCH_DETAIL.json shape): per-query
deltas sorted by regression size, plus totals — the first thing to
run when a round's numbers move.

Usage: python tools/bench_compare.py OLD.json NEW.json [min_delta_s]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    min_delta = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((float("inf") if a is None else -float("inf"), name, a, b))
        elif abs(b - a) >= min_delta:
            rows.append((b - a, name, a, b))
    rows.sort(key=lambda r: -r[0])
    print(f"total: {old.get('value')} -> {new.get('value')} "
          f"({len(oq)} -> {len(nq)} queries, sf {old.get('sf')} -> {new.get('sf')})")
    for delta, name, a, b in rows:
        tag = "NEW" if a is None else ("GONE" if b is None else f"{delta:+6.2f}s")
        print(f"{tag:>8}  {name:40s} {a if a is not None else '-':>7} -> {b if b is not None else '-'}")


if __name__ == "__main__":
    main()
