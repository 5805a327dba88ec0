"""Query/operator library.

Each submodule exports:
- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` — named
  operators, each loading tables from an ``sf_dir`` of parquet files and
  returning a DataFrame (never collecting).
- ``ORACLES: dict[str, str]`` — DuckDB ANSI-SQL equivalents over the same
  tables (registered as views by the verification driver).  Keys without an
  oracle are genuinely non-SQL-expressible and get a rows-only check.

Cross-engine determinism rules used throughout (so value-hashes match):
- double aggregations go through exact ``decimal`` sums, cast back to
  ``double`` at the end (bit-identical in Spark and DuckDB);
- dates are emitted as ``yyyy-MM-dd`` strings, timestamps as epoch bigint;
- hashing is md5-based (`functions.md5_long`) — identical in both engines;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mongo_hadoop_spark.operators import (
    asof, dedup, multimodal, pipeline, relational, relational2, relational3,
    relational4, relational5, similarity, skew, textstats, windows,
)

_MODULES = [relational, relational2, relational3, relational4, relational5,
            windows, dedup, similarity, textstats,
            multimodal, skew, pipeline, asof]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
