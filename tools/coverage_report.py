#!/usr/bin/env python
"""Driver-row coverage report: which registry queries have a
driver-verified correctness row, and which are relying on local-only
verification — the input for per-round registry rotation.

Usage: python tools/coverage_report.py [CORRECTNESS_r01.json ...]
(defaults to every CORRECTNESS_r*.json in the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo_hadoop_spark import operators  # noqa: E402


def main(argv: list[str]) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = argv or sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    verified: dict[str, str] = {}
    for f in files:
        rnd = os.path.basename(f)
        for k, v in json.load(open(f)).items():
            ok = v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
            # a later round's verdict supersedes an earlier one
            if ok:
                verified[k] = rnd
            elif k not in verified:
                verified[k] = f"FAIL:{rnd}"

    ks = list(operators.all_queries())
    print(f"registry: {len(ks)} queries | driver rows from: "
          f"{', '.join(os.path.basename(f) for f in files) or 'none'}\n")
    never = []
    for i, k in enumerate(ks):
        status = verified.get(k, "never")
        window = "in-window " if i < 50 else "tail      "
        if status == "never":
            never.append(k)
        print(f"{i:3d} {window} {status:22s} {k}")
    print(f"\nnever driver-verified: {len(never)}")
    in_window_never = [k for k in never if ks.index(k) < 50]
    print(f"  of those, inside the 50-entry prefix: {len(in_window_never)}")
    out = [k for k in never if ks.index(k) >= 50]
    if out:
        print(f"  OUTSIDE the prefix (rotate these in): {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
