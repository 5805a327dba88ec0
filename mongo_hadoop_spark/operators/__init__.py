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
    analytics, asof, dedup, mongoagg, multimodal, pipeline, relational,
    relational2, relational3, relational4, relational5, similarity, sketches,
    skew, textstats, windows,
)

_MODULES = [relational, relational2, relational3, relational4, relational5,
            windows, dedup, similarity, textstats,
            multimodal, skew, pipeline, asof, mongoagg, analytics,
            sketches]

# Registry order is part of the verification contract: external harnesses may
# only sample a prefix of ``queries()``, so the entries that most need a fresh
# cross-engine check come first.  Round-4 rotation: the two asof queries
# repaired this round (TIMESTAMP_NTZ fix) and the ten queries that have never
# had a driver-verified row lead; then everything whose only driver row dates
# from round 1 — the testdata environment has changed since (events.ts is now
# tz-less parquet → TIMESTAMP_NTZ), so r01-era verdicts deserve a re-check —
# ordered timestamp-touching queries first.  The tail is the round-3-verified
# set, freshly green under the current environment.
_HEAD_KEYS = [
    # repaired this round (NTZ root-cause fix in session.table)
    "events_asof_last_order", "events_asof_last_order_tolerance",
    # never driver-verified before this round
    "dedup_exact_survivors", "dedup_simhash_groups", "ivf_cell_histogram",
    "lsh_bucket_assign", "multimodal_chunks", "embedding_norms",
    "ivf_assign_refined", "multimodal_metadata", "dedup_minhash_signatures",
    "groupingsets_agg",
    # new this round — first driver check
    "documents_train_split", "events_per_user_sample",
    "dedup_semantic_survivors", "pipeline_bucket_auto_quartiles",
    "dedup_containment", "orders_rfm_segments", "text_heavy_hitters",
    "corpus_training_manifest", "embedding_pq_codes", "pq_knn_adc",
    "dedup_semantic_survivors_ivf", "embedding_pq_codes_trained",
    # r01-verified event/timestamp consumers — re-check under NTZ testdata
    "window_topn_per_group", "window_running_sum", "window_event_gaps",
    "events_tumbling_window", "events_sliding_window",
    "grouped_reducer_stats", "a4_log_rollup", "a1_avg_by_year",
    "u2_objectid_seconds", "a2_upsert_docs",
    # r01-verified joins/aggregates — oldest outstanding driver verdicts
    "tpch_q2_min_cost_supplier", "tpch_q16_supplier_cnt",
    "tpch_q20_excess_suppliers",
    "tpch_q7_nation_volume", "tpch_q8_market_share", "tpch_q9_profit",
    "tpch_q21_waiting_supplier", "tpch_q11_value_share",
    "tpch_q13_distribution", "tpch_q15_top_supplier",
    "tpch_q17_small_quantity", "tpch_q19_disjunctive",
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = merged.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        merged.update(m.QUERIES)
    missing = [k for k in _HEAD_KEYS if k not in merged]
    if missing:
        raise ValueError(f"unknown head keys: {missing}")
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in _HEAD_KEYS:
        out[k] = merged[k]
    for k, fn in merged.items():
        if k not in out:
            out[k] = fn
    assert len(out) == len(merged)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
