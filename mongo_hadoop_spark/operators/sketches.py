"""Mergeable cardinality sketches as deterministic, oracle-exact operators.

Spark's built-in ``approx_count_distinct`` is a HyperLogLog, but its
register state is opaque and engine-specific — it cannot be cross-checked
against another engine, merged outside Spark, or stored as a stable
artifact.  This module re-derives HLL from first principles with *pure
integer column math* on the repo's cross-engine md5 hash, so that:

- the **register table is the query result** — (register, max_rho) rows
  are deterministic integers, bit-identical in Spark and DuckDB (the
  correctness gate hashes them);
- the sketch is **mergeable by construction** — union register tables
  and take per-register max (tested: sketch(A ∪ B) == merge(sketch(A),
  sketch(B))), which is what lets 1000 executors sketch 100 TB with one
  256-row shuffle;
- the estimate stays deterministic: the harmonic denominator is the
  *integer* ``Σ 2^(62-rho)`` (exact in int64 — no float summation order
  to drift), with a single float division at the very end.

Layout of the 60-bit hash ``h = md5_long(key)``:
  register index = h % 256 (m=256 registers, b=8)
  payload       = h // 256 (52 bits)
  rho           = leading zeros of the payload within 52 bits, + 1
                = 53 - bitlength(payload)   (payload=0 → rho = 53)

Standard HLL estimate (Flajolet et al. 2007): E = α_m · m² / Σ 2^(-M_j),
with linear counting below 2.5m — implemented in :func:`hll_estimate`
over the register table (driver-side on 256 rows).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mongo_hadoop_spark.functions import md5_long, md5_long_sql
from mongo_hadoop_spark.session import table

HLL_M = 256          # registers (b = 8 index bits)
_PAYLOAD_BITS = 52   # 60-bit hash minus 8 index bits
ALPHA_256 = 0.7213 / (1 + 1.079 / HLL_M)  # α_m for m ≥ 128


def _hll_registers(keyed: DataFrame) -> DataFrame:
    """(register, max_rho) sketch state for the ``key`` string column."""
    h = md5_long(F.col("key"))
    payload = F.floor(h / HLL_M).cast("long")
    rho = F.when(payload == 0, F.lit(_PAYLOAD_BITS + 1)).otherwise(
        F.lit(_PAYLOAD_BITS + 1) - F.length(F.bin(payload))
    ).cast("long")
    return (
        keyed.select((h % HLL_M).cast("long").alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def _hll_sql(key_expr: str, source_sql: str) -> str:
    h = md5_long_sql(key_expr)
    return f"""
WITH hashed AS (
  SELECT {h} AS h FROM ({source_sql})
),
parts AS (
  SELECT (h % {HLL_M})::bigint AS register,
         (CASE WHEN h // {HLL_M} = 0 THEN {_PAYLOAD_BITS + 1}
               ELSE {_PAYLOAD_BITS + 1} - length(bin(h // {HLL_M})) END)::bigint AS rho
  FROM hashed
)
SELECT register, max(rho) AS max_rho FROM parts GROUP BY 1
"""


def sketch_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register table over distinct event users."""
    e = table(spark, sf_dir, "events")
    return _hll_registers(e.select(F.col("user_id").cast("string").alias("key")))


SKETCH_HLL_USERS_SQL = _hll_sql("key", "SELECT user_id::varchar AS key FROM events")


def sketch_hll_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register table over document texts — the streaming-friendly
    cardinality of a 100 TB corpus (distinct-content count without a
    distinct shuffle: 256 rows of state per executor, merged by max)."""
    d = table(spark, sf_dir, "documents")
    return _hll_registers(d.select(F.col("text").alias("key")))


SKETCH_HLL_DOCS_SQL = _hll_sql("key", "SELECT text AS key FROM documents")


def hll_estimate(registers: list[tuple[int, int]]) -> float:
    """Cardinality estimate from (register, max_rho) rows.

    The harmonic denominator is computed as the exact integer
    ``Σ 2^(62-rho)`` scaled by 2^-62, so every float enters through one
    multiplication and one division — deterministic across platforms.
    Registers absent from the list have M_j = 0.  Linear counting is used
    below 2.5m (standard small-range correction).
    """
    got = dict(registers)
    scaled = sum(1 << (62 - got.get(j, 0)) for j in range(HLL_M))
    est = ALPHA_256 * HLL_M * HLL_M * (2.0 ** 62) / scaled
    zeros = HLL_M - len([j for j in got if got[j] > 0])
    if est <= 2.5 * HLL_M and zeros > 0:
        return HLL_M * math.log(HLL_M / zeros)
    return est


def merge_registers(*register_dfs: DataFrame) -> DataFrame:
    """Merge sketches: union the register tables, keep per-register max.
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) — asserted in tests."""
    out = register_dfs[0]
    for df in register_dfs[1:]:
        out = out.unionAll(df)
    return out.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


QUERIES = {
    "sketch_hll_users": sketch_hll_users,
    "sketch_hll_documents": sketch_hll_documents,
}

ORACLES = {
    "sketch_hll_users": SKETCH_HLL_USERS_SQL,
    "sketch_hll_documents": SKETCH_HLL_DOCS_SQL,
}
