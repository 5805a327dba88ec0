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
# cross-engine check come first.  Round-10 rotation (the round-9 verdict's
# item 1): the 5 queries new this round (the fixed-K coarse quantizer
# pair + its IVF-PQ serving composition, the windowed approx-percentile
# production-mode twin, and the $dateDiff startOfWeek convention gate)
# plus the one
# changed-with-pinned-hash compile path (pipeline_array_aggregates:
# its {$sum:"$q"} now dispatches through the r10 scalar-pass-through
# type check — array input, plan unchanged) lead, then ALL 32 queries
# whose latest driver verdicts date from round 5, then the 12 oldest
# round-6 rows fill the 50-entry prefix.  The remaining r6 rows queue
# just below the window for round 11; fully-green r7/r8/r9 verdicts
# rotate to the tail.
_HEAD_KEYS = [
    # new this round — never driver-verified
    "ivf_assign_fixed",
    "dedup_semantic_survivors_ivf_fixed",
    "ivf_pq_knn_fixed",
    "pipeline_window_percentiles_approx",
    "pipeline_datediff_weekstarts",
    # changed this round — compile path touched, hash pinned unchanged
    "pipeline_array_aggregates",
    # r05-verified — the 32 oldest outstanding driver verdicts
    "dedup_duplicate_spans",
    "documents_priority_sample",
    "documents_span_dedup_survivors", "documents_span_stats",
    "events_asof_next_order", "pipeline_bitwise_flags",
    "pipeline_event_calculus", "pipeline_fill_linear",
    "pipeline_geo_within", "pipeline_jsonschema_gate",
    "pipeline_lookup_correlated", "pipeline_match_operators",
    "pipeline_object_to_array", "pipeline_price_percentiles",
    "pipeline_redact_levels", "pipeline_regex_type_report",
    "pipeline_search_bm25", "pipeline_search_fuzzy",
    "pipeline_search_querystring", "pipeline_search_wildcard",
    "pipeline_text_search", "pipeline_top_orders_per_status",
    "pipeline_vector_search", "sketch_bloom_audit", "sketch_bloom_tokens",
    "sketch_cms_estimates", "sketch_cms_tokens", "sketch_ddq_buckets",
    "sketch_ddq_quantiles", "text_bigram_surprisal", "text_gopher_quality",
    "text_unigram_surprisal",
    # r06-verified — oldest twelve fill the window; the rest queue
    # below it (alphabetical within the era: equally stale, stable order)
    "corpus_crawl_increment", "corpus_doremi_quotas",
    "corpus_doremi_weights", "corpus_dsir_selected",
    "corpus_perplexity_buckets", "corpus_quota_fill",
    "corpus_repetition_yield", "corpus_source_mixture_docs",
    "corpus_token_quotas", "dedup_cluster_stats",
    "dedup_connected_clusters", "dedup_survivors_by_authority",
    # --- 50-entry window boundary (r11 rotation starts here) ---
    "documents_chunk_windows",
    "documents_fim_transform", "embedding_gram_matrix",
    "embedding_matryoshka_recall", "embedding_pca_whitened",
    "embedding_pq_codes_fixed", "embedding_pq_codes_trained",
    "embedding_random_projection", "embeddings_cluster_sample",
    "events_value_anomalies", "graph_degree_histogram",
    "graph_pagerank_neardup", "ivf_assign_lloyd", "ivf_assign_refined",
    "ivf_pq_knn", "pipeline_exp_moving_avg", "pipeline_geo_center_sphere",
    "pipeline_geo_polygon_sphere", "pipeline_rank_fusion",
    "pipeline_score_fusion", "pipeline_search_highlights",
    "pipeline_search_meta_facets", "pq_knn_adc_fixed",
    "skew_salted_rollup", "text_repetition_flags", "tpch_q11_value_share",
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
