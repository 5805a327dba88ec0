#!/usr/bin/env python
"""Compare two bench JSON records per query.

    python tools/bench_compare.py BENCH_r01.json /tmp/bench_r4_final.json

Accepts either the raw bench.py output line or the driver's wrapper
({"parsed": {...}}).  Prints per-query ratios sorted worst-first and the
total ratio — the number the round verdict grades.

CI contract: exits 1 when any shared query regressed by more than
``--threshold`` (default 1.5×) or changed its row count (a semantics
shift masquerading as a perf shift), so a perf regression fails a
pipeline instead of waiting for the next verdict to notice.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept the driver wrapper, a single JSON blob, or bench.py's
    two-line output (full blob first, truncation-proof compact summary
    last) — prefer the line that carries per-query timings."""
    with open(path) as fh:
        text = fh.read()
    try:
        d = json.loads(text)
        return d.get("parsed") or d
    except json.JSONDecodeError:
        pass
    best = None
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        d = d.get("parsed") or d
        if "queries" in d:
            return d
        best = best or d
    if best is None:
        raise SystemExit(f"{path}: no parseable JSON line")
    return best


def main(argv: list[str]) -> int:
    threshold = 1.5
    if "--threshold" in argv:
        i = argv.index("--threshold")
        try:
            threshold = float(argv[i + 1])
        except (IndexError, ValueError):
            print(__doc__)
            print("--threshold needs a numeric value")
            return 2
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 2:
        print(__doc__)
        return 2
    base, new = load(argv[0]), load(argv[1])
    bq, nq = base["queries"], new["queries"]

    def ratio(k: str) -> float:
        # bench.py rounds to 3 decimals: a sub-ms base would divide by 0
        return nq[k] / max(bq[k], 1e-3)

    shared = sorted(set(bq) & set(nq), key=lambda k: -ratio(k))
    regressed = [k for k in shared if ratio(k) > threshold]
    print(f"{'query':38s} {'base':>8s} {'new':>8s} {'ratio':>7s}")
    for k in shared:
        flag = "  << REGRESSED" if k in regressed else ""
        print(f"{k:38s} {bq[k]:8.3f} {nq[k]:8.3f} {ratio(k):6.2f}x{flag}")
    only_b = set(bq) - set(nq)
    only_n = set(nq) - set(bq)
    if only_b:
        print(f"only in base: {sorted(only_b)}")
    if only_n:
        print(f"only in new:  {sorted(only_n)}")
    br, nr = base.get("rows") or {}, new.get("rows") or {}
    row_drift = [k for k in set(br) & set(nr) if br[k] != nr[k]]
    if row_drift:
        print("ROW-COUNT DRIFT (semantics change, not perf): "
              + ", ".join(f"{k} {br[k]}->{nr[k]}" for k in sorted(row_drift)))
    # Like-for-like subset totals, NAMED by the files being compared —
    # the r10 verdict caught a comparability line that divided a shared-
    # subset numerator by a different round's full-set denominator.  The
    # headline ratio is always sum-over-shared vs sum-over-shared.
    b_sub = sum(bq[k] for k in shared)
    n_sub = sum(nq[k] for k in shared)
    print(f"\nSHARED SUBSET ({len(shared)} queries): "
          f"{argv[0]} {b_sub:.3f}s -> {argv[1]} {n_sub:.3f}s "
          f"({n_sub / max(b_sub, 1e-3):.3f}x)")
    med = sorted(ratio(k) for k in shared)[len(shared) // 2] if shared \
        else float("nan")
    print(f"median per-query ratio: {med:.2f}x")
    # bench.py records "value"; full_sweep.py records "total_sec"
    bv = base.get("value", base.get("total_sec", b_sub))
    nv = new.get("value", new.get("total_sec", n_sub))
    print(f"FULL TOTAL (sets may differ): {bv:.3f} -> "
          f"{nv:.3f} ({nv / max(bv, 1e-3):.3f}x)"
          + (f"  [new: {new.get('n_failed', 0)} failed]"))
    if regressed:
        print(f"FAIL: {len(regressed)} queries over {threshold}x: "
              f"{regressed}")
    return 1 if (regressed or row_drift) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
