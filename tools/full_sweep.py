#!/usr/bin/env python
"""One-time full-registry timed sweep (r9 verdict item 2).

The official bench covers the headline subset; this tool times EVERY
registered query at an sf dir (default sf0.1) under the same noop-sink
materialization, so expensive outliers cannot hide in the unbenched tail
(the 60 s ``pipeline_search_highlights`` incident, SCALE.md r6, was
caught by a probe — not the bench).  Output: one JSON artifact with
per-query seconds + rows, sorted slowest-first on stderr for probing.

Usage: python tools/full_sweep.py [--out SWEEP.json] [--repeats 2]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SWEEP_LOCAL.json")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of query names")
    args = ap.parse_args()

    from pyspark.sql import Observation
    import pyspark.sql.functions as F

    from mongo_hadoop_spark import operators
    from mongo_hadoop_spark.session import get_spark, table

    spark = get_spark(app_name="mhs-full-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = operators.all_queries()
    if args.only:
        keep = set(args.only.split(","))
        queries = {k: v for k, v in queries.items() if k in keep}

    load_start = round(os.getloadavg()[0], 2)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        table(spark, args.sf_dir, t).count()
    import pandas as pd  # noqa: F401
    (spark.range(1000, numPartitions=8)
     .mapInPandas(lambda it: it, "id long").count())

    timings: dict[str, float] = {}
    rows_out: dict[str, int] = {}
    errors: dict[str, str] = {}
    for i, (name, fn) in enumerate(queries.items()):
        best, rows = None, 0
        try:
            for rep in range(args.repeats):
                obs = Observation(f"sweep_{name}_{rep}")
                t0 = time.perf_counter()
                (fn(spark, args.sf_dir)
                 .observe(obs, F.count(F.lit(1)).alias("n"))
                 .write.format("noop").mode("overwrite").save())
                elapsed = time.perf_counter() - t0
                rows = int(obs.get["n"])
                best = elapsed if best is None or elapsed < best else best
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"[{i + 1}/{len(queries)}] {name}: FAILED "
                  f"({errors[name].partition(chr(10))[0]})", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        rows_out[name] = rows
        print(f"[{i + 1}/{len(queries)}] {name}: {best:.3f}s ({rows} rows)",
              file=sys.stderr)
        gc.collect()

    out = {
        "sf_dir": args.sf_dir,
        "repeats": args.repeats,
        "materialize": "noop_sink",
        "n_queries": len(queries),
        "n_failed": len(errors),
        "total_sec": round(sum(timings.values()), 3),
        "load_avg_1m_start": load_start,
        "load_avg_1m_end": round(os.getloadavg()[0], 2),
        "queries": timings,
        "rows": rows_out,
    }
    if errors:
        out["errors"] = errors
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("\nslowest 15:", file=sys.stderr)
    for k, v in sorted(timings.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {v:7.3f}s  {k}", file=sys.stderr)
    print(json.dumps({"total_sec": out["total_sec"],
                      "n_queries": out["n_queries"],
                      "n_failed": out["n_failed"]}))


if __name__ == "__main__":
    main()
