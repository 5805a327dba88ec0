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
    analytics, asof, bpe, dedup, graph, linalg, mongoagg, multimodal,
    pipeline, relational, relational2, relational3, relational4, relational5,
    repetition, selection, similarity, sketches, skew, spans, textstats,
    windows, lm,
)

_MODULES = [relational, relational2, relational3, relational4, relational5,
            windows, dedup, graph, spans, lm, selection, similarity, linalg,
            textstats, repetition, multimodal, skew, pipeline, asof,
            mongoagg, analytics, sketches, bpe]

# Registry order is part of the verification contract: external harnesses may
# only sample a prefix of ``queries()``, so the entries that most need a fresh
# cross-engine check come first.  Round-7 rotation (the round-6 verdict's
# item 1: put the 50 STALEST driver verdicts in the window): new-this-round
# queries lead, then the queries whose plan/oracle changed this round
# ($geoNear tiebreak ORDER BY, the chunk-dedup packed-key guard), then the
# 19 queries whose only driver rows date from round 1, then the
# round-3-verified set fills the rest of the 50-entry prefix and spills just
# below it (the spill rotates into round 8).  The fully-green r4/r5/r6
# verdicts rotate to the tail.
_HEAD_KEYS = [
    # new this round — never driver-verified
    "pipeline_geo_intersects", "corpus_dup_spans", "corpus_span_excised",
    "dedup_span_alignments", "corpus_span_increment",
    # changed this round — fresh hash rows needed
    "pipeline_geo_near", "pipeline_geo_near_sphere", "corpus_chunk_dedup",
    # r01-verified — oldest outstanding driver verdicts
    "a1_avg_by_year",
    "a3_pair_counts", "a5_frequent_short_tokens", "s6_tokenize_stats",
    "s8_multi_union", "hive_pushdown_conjunction", "f3_sort_limit",
    "s2_dotted_key_extract", "tpch_q10", "tpch_q14", "tpch_q18",
    "set_except", "set_intersect", "rollup_agg", "broadcast_dim_join",
    "json_roundtrip", "custom_sort_comparator", "tpch_q4_semijoin",
    "tpch_q22_antijoin", "cube_agg", "count_distinct_suppliers",
    "treasury_doubled", "u2_objectid_seconds",
    # r03-verified — next-oldest; fills the 50-entry prefix...
    "f4_skip_pagination", "tpch_q12", "events_session_windows",
    "window_spend_quartiles", "dedup_exact", "dedup_minhash_lsh_pairs",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_minhash_verified",
    "corpus_decontaminate", "ivf_assign", "ivf_knn", "ivf_knn_nprobe",
    "knn_bruteforce", "near_dup_pairs_cosine",
    "embedding_quantize_int8", "ivf_recall_report", "lsh_bucket_histogram",
    "text_langid", "text_quality", "text_token_count", "text_fingerprint",
    "documents_pack_sequences", "text_top_distinctive_terms",
    "text_redact_pii", "text_repetition_ratio",
    # ...and spills below it (these r03 rows rotate into the r8 window)
    "multimodal_decode_features", "multimodal_frame_sample",
    "multimodal_resize", "corpus_yield_report", "pipeline_status_rollup",
    "pipeline_wordcount", "pipeline_lookup_segment", "pipeline_sortbycount",
    "pipeline_bucket_order_values", "pipeline_window_fields",
    "pipeline_densify_user_counts", "pipeline_graphlookup_reports",
    "events_funnel", "events_cohort_retention", "orders_quantile_rollup",
    "documents_stratified_sample", "user_activity_histogram",
    "sketch_hll_users", "sketch_hll_documents",
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
