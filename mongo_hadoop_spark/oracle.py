"""Local replica of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle SQL side-by-side on the same
parquet tables, then compares row-count, schema shape, and
order-insensitive values (columns sorted by name, rows sorted by all
columns).  Used by tests/test_oracle_parity.py so every ``queries()``
entry is verified before the driver ever sees it.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # DuckDB's default memory_limit (80% of RAM) is miscalibrated when a
    # Spark JVM shares the box: at sf0.1 the full-registry sweep died in
    # an OOM cascade ("Failed to allocate block of 3422 bytes") once the
    # first heavy oracle exhausted the shared budget.  Cap the budget
    # explicitly and let heavy oracles spill to disk instead of failing.
    con.execute("SET memory_limit='16GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int
    rows_oracle: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.rows_spark} oracle={self.rows_oracle}"
        for m in self.mismatches[:5]:
            msg += f"\n    - {m}"
        return msg


def compare(name: str, spark_df, oracle_df: pd.DataFrame,
            float_tol: float = 0.0) -> CompareResult:
    sp = _canon(spark_df.toPandas())
    oc = _canon(oracle_df)
    res = CompareResult(name, True, len(sp), len(oc))
    if len(sp) != len(oc):
        res.ok = False
        res.mismatches.append(f"row count {len(sp)} != {len(oc)}")
        return res
    if list(sp.columns) != list(oc.columns):
        res.ok = False
        res.mismatches.append(f"columns {list(sp.columns)} != {list(oc.columns)}")
        return res
    # Dtype-family-strict: the driver's value-hash is sensitive to the
    # *family* of the physical type — e.g. a DuckDB HUGEINT sum reaches
    # pandas as float64 while Spark's bigint arrives as int64, so "2" vs
    # "2.0" hash-diverges (the tpch_q12 round-1 failure).  Width-only
    # differences (int32 vs int64) canonicalize identically and pass the
    # driver, so compare by family: integer / float / bool / datetime /
    # other.  Cross-family ⇒ fail locally, same as the driver would.
    def _family(dt) -> str:
        if pd.api.types.is_bool_dtype(dt):
            return "bool"
        if pd.api.types.is_integer_dtype(dt):
            return "int"
        if pd.api.types.is_float_dtype(dt):
            return "float"
        if pd.api.types.is_datetime64_any_dtype(dt):
            return "datetime"
        return str(dt)

    for c in sp.columns:
        fa, fb = _family(sp[c].dtype), _family(oc[c].dtype)
        if fa != fb:
            res.ok = False
            res.mismatches.append(
                f"col {c} dtype family {fa}({sp[c].dtype}) != {fb}({oc[c].dtype}) "
                f"(cast both sides to the same type; e.g. ::bigint for integer sums)")
    if not res.ok:
        return res
    for c in sp.columns:
        a, b = sp[c], oc[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            af = a.astype(float).to_numpy()
            bf = b.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(af, bf)):
                if x == y or (math.isnan(x) and math.isnan(y)):
                    continue
                if float_tol and abs(x - y) <= float_tol * max(1.0, abs(y)):
                    continue
                res.ok = False
                res.mismatches.append(f"col {c} row {i}: {x!r} != {y!r} (delta={x - y!r})")
                if len(res.mismatches) > 8:
                    return res
        else:
            neq = ~(a.eq(b) | (a.isna() & b.isna()))
            if neq.any():
                i = int(neq.idxmax())
                res.ok = False
                res.mismatches.append(f"col {c} row {i}: {a[i]!r} != {b[i]!r}")
    return res


def main() -> None:  # pragma: no cover
    """CLI: ``python -m mongo_hadoop_spark.oracle [sf_dir] [query ...]``"""
    import sys

    from mongo_hadoop_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark(app_name="oracle-gate")
    spark.sparkContext.setLogLevel("ERROR")
    results = run_all(spark, sf_dir, only=only)
    for r in results:
        print(r)
    ok = sum(r.ok for r in results)
    print(f"{ok}/{len(results)} OK")
    spark.stop()
    sys.exit(0 if ok == len(results) else 1)


def run_all(spark, sf_dir: str, only: list[str] | None = None,
            float_tol: float = 0.0) -> list[CompareResult]:
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = set(only) - queries.keys()
        if unknown:
            raise KeyError(f"unknown queries: {sorted(unknown)}; "
                           f"available: {sorted(queries)}")
    results = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            df = fn(spark, sf_dir)
            n = df.count()
            results.append(CompareResult(name, n >= 0, n, -1, ["no oracle (rows-only)"]))
            continue
        # Fresh connection per query: DuckDB retains buffers across
        # statements on one connection, and at sf0.1 the accumulation
        # OOM'd a recursive-CTE oracle that runs fine on a clean
        # connection (the same query passed right after a reconnect).
        # View registration is ~ms against any oracle's runtime.
        con = duck_connection(sf_dir)
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
            res = compare(name, fn(spark, sf_dir), oracle_df, float_tol=float_tol)
        except Exception as e:  # pragma: no cover
            res = CompareResult(name, False, -1, -1, [f"{type(e).__name__}: {e}"])
        finally:
            con.close()
        results.append(res)
    return results


if __name__ == "__main__":  # pragma: no cover
    main()
