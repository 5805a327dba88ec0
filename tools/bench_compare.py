#!/usr/bin/env python
"""Compare two bench JSON records per query.

    python tools/bench_compare.py BENCH_r01.json /tmp/bench_r4_final.json

Accepts either the raw bench.py output line or the driver's wrapper
({"parsed": {...}}).  Prints per-query ratios sorted worst-first and the
total ratio — the number the round verdict grades.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    return d.get("parsed") or d


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__)
        return 2
    base, new = load(argv[0]), load(argv[1])
    bq, nq = base["queries"], new["queries"]
    shared = sorted(set(bq) & set(nq), key=lambda k: -(nq[k] / bq[k]))
    print(f"{'query':38s} {'base':>8s} {'new':>8s} {'ratio':>7s}")
    for k in shared:
        print(f"{k:38s} {bq[k]:8.3f} {nq[k]:8.3f} {nq[k] / bq[k]:6.2f}x")
    only_b = set(bq) - set(nq)
    only_n = set(nq) - set(bq)
    if only_b:
        print(f"only in base: {sorted(only_b)}")
    if only_n:
        print(f"only in new:  {sorted(only_n)}")
    print(f"\nTOTAL {base['value']:.3f} -> {new['value']:.3f} "
          f"({new['value'] / base['value']:.3f}x)"
          + (f"  [new: {new.get('n_failed', 0)} failed]"))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
